"""Torch-checkpoint import/export for the registration-track models.

The reference trains SampleNet + PCRNet in torch and saves
`model.state_dict()` (registration/main.py:196-218), where `model` is a
PCRNet with the sampler attached as `model.sampler`
(registration/main.py:296). The resulting key surface:

    feat.conv{1..5}.{weight,bias}            PCRNet per-point MLP
    fc{1..6}.{weight,bias}                   PCRNet FC head
    sampler.conv{1..5}.{weight,bias}         SampleNet simplification MLP
    sampler.bn{1..5}.{weight,bias,running_mean,running_var,
                      num_batches_tracked}
    sampler.fc{1..4}.{weight,bias}           SampleNet FC head
    sampler.bn_fc{1..3}.{...}
    sampler.project._temperature             SoftProjection temperature

(attribute names from registration/src/samplenet.py:40-62 and
registration/models/pcrnet.py:17-60). This module maps those tensors
onto the flax variable trees of `models.samplenet.SampleNet` /
`models.pcrnet.PCRNet`, and back. Conventions converted:

  * Conv1d weight [out, in, 1]  -> Dense kernel [in, out] (squeeze + T)
  * Linear weight [out, in]     -> Dense kernel [in, out] (T)
  * BatchNorm1d weight/bias     -> BN scale/bias (params)
    running_mean/running_var    -> BN mean/var (batch_stats)
  * _temperature (0-d or [1])   -> project/temperature ()

All mapping functions take/return plain dicts of numpy arrays so they
are torch-free; only `load_torch_checkpoint` needs torch installed.
Import is strict: unexpected keys under the claimed prefix raise (with
the standard `num_batches_tracked` counters ignored).

The TF1 tracks (classification, reconstruction) store TF checkpoints,
which cannot be parsed without tensorflow (not available here); those
remain retrain-only and are documented as such in README.md.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

_IGNORED = ("num_batches_tracked",)


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a .pth file into a flat {key: numpy array} dict.

    Accepts both bare state_dicts (model_best/model_last,
    registration/main.py:209-212) and snapshot wrappers holding the
    state dict under "model" (main.py:196-207). DistributedDataParallel
    "module." prefixes are stripped.
    """
    import torch  # local: mapping itself is torch-free

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model" in obj and not _is_tensor(obj["model"]):
        obj = obj["model"]
    out = {}
    for k, v in obj.items():
        if not hasattr(v, "detach"):
            continue  # scalars like epoch/min_loss in snapshot dicts
        out[k.removeprefix("module.")] = v.detach().cpu().numpy()
    return out


def _is_tensor(x: Any) -> bool:
    return hasattr(x, "detach")


def _take(sd: dict, used: set, key: str) -> np.ndarray:
    if key not in sd:
        raise KeyError(f"torch checkpoint is missing expected key {key!r}")
    used.add(key)
    return np.asarray(sd[key])


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    if w.ndim != 3 or w.shape[-1] != 1:
        raise ValueError(f"expected Conv1d weight [out, in, 1], got {w.shape}")
    return np.ascontiguousarray(w[:, :, 0].T)


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    if w.ndim != 2:
        raise ValueError(f"expected Linear weight [out, in], got {w.shape}")
    return np.ascontiguousarray(w.T)


def _check_no_leftovers(sd: dict, used: set, prefix: str) -> None:
    extra = [
        k for k in sd
        if k.startswith(prefix) and k not in used
        and not k.endswith(_IGNORED)
    ]
    if extra:
        raise ValueError(
            f"unexpected keys under prefix {prefix!r}: {sorted(extra)[:8]}"
            f"{'...' if len(extra) > 8 else ''}"
        )


def infer_samplenet_config(
    sd: dict[str, np.ndarray], prefix: str = "sampler."
) -> dict[str, Any]:
    """Constructor kwargs for `SampleNet` matching a torch state_dict.

    Widths are read off the weight shapes, so imports work for any of the
    reference's size variants (num_out_points from fc4's 3m output,
    registration/src/samplenet.py:55).
    """
    convs = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.fullmatch(re.escape(prefix) + r"conv(\d+)\.weight", k))
    )
    if not convs:
        raise KeyError(f"no {prefix}conv*.weight keys in checkpoint")
    widths = [sd[f"{prefix}conv{i}.weight"].shape[0] for i in convs]
    fcs = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.fullmatch(re.escape(prefix) + r"fc(\d+)\.weight", k))
    )
    fc_widths = [sd[f"{prefix}fc{i}.weight"].shape[0] for i in fcs[:-1]]
    out_dim = sd[f"{prefix}fc{fcs[-1]}.weight"].shape[0]
    if out_dim % 3:
        raise ValueError(f"final FC emits {out_dim} values; expected 3*m")
    return {
        "num_out_points": out_dim // 3,
        "bottleneck_size": widths[-1],
        "conv_widths": tuple(widths[:-1]),
        "fc_widths": tuple(fc_widths),
        "fc_bn": any(k.startswith(f"{prefix}bn_fc") for k in sd),
    }


def samplenet_from_torch(
    sd: dict[str, np.ndarray], prefix: str = "sampler."
) -> dict[str, Any]:
    """Flax variables ({"params", "batch_stats"}) for `SampleNet` from a
    torch state_dict (keys per registration/src/samplenet.py:40-62)."""
    cfg = infer_samplenet_config(sd, prefix)
    n_conv = len(cfg["conv_widths"]) + 1
    n_fc = len(cfg["fc_widths"])
    used: set[str] = set()

    convs_p, convs_s = {}, {}
    for i in range(n_conv):
        convs_p[f"dense_{i}"] = {
            "kernel": _conv_kernel(_take(sd, used, f"{prefix}conv{i+1}.weight")),
            "bias": _take(sd, used, f"{prefix}conv{i+1}.bias"),
        }
        convs_p[f"bn_{i}"] = {
            "scale": _take(sd, used, f"{prefix}bn{i+1}.weight"),
            "bias": _take(sd, used, f"{prefix}bn{i+1}.bias"),
        }
        convs_s[f"bn_{i}"] = {
            "mean": _take(sd, used, f"{prefix}bn{i+1}.running_mean"),
            "var": _take(sd, used, f"{prefix}bn{i+1}.running_var"),
        }

    fcs_p, fcs_s = {}, {}
    for i in range(n_fc):
        fcs_p[f"dense_{i}"] = {
            "kernel": _linear_kernel(_take(sd, used, f"{prefix}fc{i+1}.weight")),
            "bias": _take(sd, used, f"{prefix}fc{i+1}.bias"),
        }
        if cfg["fc_bn"]:
            fcs_p[f"bn_{i}"] = {
                "scale": _take(sd, used, f"{prefix}bn_fc{i+1}.weight"),
                "bias": _take(sd, used, f"{prefix}bn_fc{i+1}.bias"),
            }
            fcs_s[f"bn_{i}"] = {
                "mean": _take(sd, used, f"{prefix}bn_fc{i+1}.running_mean"),
                "var": _take(sd, used, f"{prefix}bn_fc{i+1}.running_var"),
            }

    out = {
        "kernel": _linear_kernel(_take(sd, used, f"{prefix}fc{n_fc+1}.weight")),
        "bias": _take(sd, used, f"{prefix}fc{n_fc+1}.bias"),
    }
    temp = _take(sd, used, f"{prefix}project._temperature")
    variables = {
        "params": {
            "simplifier": {"convs": convs_p, "fcs": fcs_p, "out": out},
            "project": {"temperature": temp.reshape(()).astype(np.float32)},
        },
        "batch_stats": {
            "simplifier": {"convs": convs_s, **({"fcs": fcs_s} if fcs_s else {})}
        },
    }
    _check_no_leftovers(sd, used, prefix)
    return variables


def samplenet_to_torch(
    variables: dict[str, Any], prefix: str = "sampler."
) -> dict[str, np.ndarray]:
    """Inverse of `samplenet_from_torch`: a torch-convention state_dict
    (numpy values; wrap with torch.as_tensor to feed load_state_dict)."""
    p, s = variables["params"], variables.get("batch_stats", {})
    simp_p, simp_s = p["simplifier"], s.get("simplifier", {})
    sd: dict[str, np.ndarray] = {}

    convs = simp_p["convs"]
    n_conv = sum(1 for k in convs if k.startswith("dense_"))
    for i in range(n_conv):
        k = np.asarray(convs[f"dense_{i}"]["kernel"])
        sd[f"{prefix}conv{i+1}.weight"] = np.ascontiguousarray(k.T)[:, :, None]
        sd[f"{prefix}conv{i+1}.bias"] = np.asarray(convs[f"dense_{i}"]["bias"])
        sd[f"{prefix}bn{i+1}.weight"] = np.asarray(convs[f"bn_{i}"]["scale"])
        sd[f"{prefix}bn{i+1}.bias"] = np.asarray(convs[f"bn_{i}"]["bias"])
        bs = simp_s["convs"][f"bn_{i}"]
        sd[f"{prefix}bn{i+1}.running_mean"] = np.asarray(bs["mean"])
        sd[f"{prefix}bn{i+1}.running_var"] = np.asarray(bs["var"])
        sd[f"{prefix}bn{i+1}.num_batches_tracked"] = np.asarray(0)

    fcs = simp_p["fcs"]
    n_fc = sum(1 for k in fcs if k.startswith("dense_"))
    for i in range(n_fc):
        k = np.asarray(fcs[f"dense_{i}"]["kernel"])
        sd[f"{prefix}fc{i+1}.weight"] = np.ascontiguousarray(k.T)
        sd[f"{prefix}fc{i+1}.bias"] = np.asarray(fcs[f"dense_{i}"]["bias"])
        if f"bn_{i}" in fcs:
            sd[f"{prefix}bn_fc{i+1}.weight"] = np.asarray(fcs[f"bn_{i}"]["scale"])
            sd[f"{prefix}bn_fc{i+1}.bias"] = np.asarray(fcs[f"bn_{i}"]["bias"])
            bs = simp_s["fcs"][f"bn_{i}"]
            sd[f"{prefix}bn_fc{i+1}.running_mean"] = np.asarray(bs["mean"])
            sd[f"{prefix}bn_fc{i+1}.running_var"] = np.asarray(bs["var"])
            sd[f"{prefix}bn_fc{i+1}.num_batches_tracked"] = np.asarray(0)

    sd[f"{prefix}fc{n_fc+1}.weight"] = np.ascontiguousarray(
        np.asarray(simp_p["out"]["kernel"]).T)
    sd[f"{prefix}fc{n_fc+1}.bias"] = np.asarray(simp_p["out"]["bias"])
    sd[f"{prefix}project._temperature"] = np.asarray(
        p["project"]["temperature"], np.float32).reshape(())
    return sd


def pcrnet_from_torch(
    sd: dict[str, np.ndarray], prefix: str = ""
) -> dict[str, Any]:
    """Flax variables for `PCRNet` from a torch state_dict
    (keys per registration/models/pcrnet.py:17-60; no batch norm)."""
    used: set[str] = set()
    convs = {}
    i = 0
    while f"{prefix}feat.conv{i+1}.weight" in sd:
        convs[f"dense_{i}"] = {
            "kernel": _conv_kernel(
                _take(sd, used, f"{prefix}feat.conv{i+1}.weight")),
            "bias": _take(sd, used, f"{prefix}feat.conv{i+1}.bias"),
        }
        i += 1
    if not convs:
        raise KeyError(f"no {prefix}feat.conv*.weight keys in checkpoint")

    params: dict[str, Any] = {"feat": {"convs": convs}}
    fcs = sorted(
        int(m.group(1))
        for k in sd
        if (m := re.fullmatch(re.escape(prefix) + r"fc(\d+)\.weight", k))
    )
    for j, n in enumerate(fcs):
        name = "twist" if n == fcs[-1] else f"fc_{j}"
        params[name] = {
            "kernel": _linear_kernel(_take(sd, used, f"{prefix}fc{n}.weight")),
            "bias": _take(sd, used, f"{prefix}fc{n}.bias"),
        }
    # only complain about non-sampler leftovers under this prefix
    extra = [
        k for k in sd
        if k.startswith(prefix) and k not in used
        and not k.startswith(f"{prefix}sampler.")
        and not k.endswith(_IGNORED)
    ]
    if extra:
        raise ValueError(f"unexpected PCRNet keys: {sorted(extra)[:8]}")
    return {"params": params}


def pcrnet_to_torch(
    variables: dict[str, Any], prefix: str = ""
) -> dict[str, np.ndarray]:
    """Inverse of `pcrnet_from_torch`."""
    p = variables["params"]
    sd: dict[str, np.ndarray] = {}
    convs = p["feat"]["convs"]
    for i in range(len(convs)):
        k = np.asarray(convs[f"dense_{i}"]["kernel"])
        sd[f"{prefix}feat.conv{i+1}.weight"] = np.ascontiguousarray(
            k.T)[:, :, None]
        sd[f"{prefix}feat.conv{i+1}.bias"] = np.asarray(
            convs[f"dense_{i}"]["bias"])
    n_fc = sum(1 for k in p if k.startswith("fc_"))
    for j in range(n_fc):
        k = np.asarray(p[f"fc_{j}"]["kernel"])
        sd[f"{prefix}fc{j+1}.weight"] = np.ascontiguousarray(k.T)
        sd[f"{prefix}fc{j+1}.bias"] = np.asarray(p[f"fc_{j}"]["bias"])
    sd[f"{prefix}fc{n_fc+1}.weight"] = np.ascontiguousarray(
        np.asarray(p["twist"]["kernel"]).T)
    sd[f"{prefix}fc{n_fc+1}.bias"] = np.asarray(p["twist"]["bias"])
    return sd


def sp_pcrnet_from_torch(
    sd: dict[str, np.ndarray]
) -> tuple[dict[str, Any], dict[str, Any] | None]:
    """Split a joint SP-PCRNet state_dict (registration/main.py:296)
    into (pcrnet_variables, samplenet_variables_or_None)."""
    pcr = pcrnet_from_torch(sd, prefix="")
    has_sampler = any(k.startswith("sampler.") for k in sd)
    sn = samplenet_from_torch(sd, prefix="sampler.") if has_sampler else None
    return pcr, sn


def main(argv: list[str] | None = None) -> None:
    """Convert a reference .pth into orbax checkpoints.

    python -m samplenet_tpu.interop.torch_import model_best.pth \
        --out /tmp/imported   # writes <out>/pcrnet and (if present)
                              # <out>/samplenet + samplenet_config.json
    """
    import argparse
    import json
    import os

    # pure conversion tool: never initialise the TPU backend (the image's
    # sitecustomize pins the axon platform; a conversion run must not
    # compete with a training client on the tunnel)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from samplenet_tpu.train import checkpoints

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("pth")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    sd = load_torch_checkpoint(args.pth)
    pcr, sn = sp_pcrnet_from_torch(sd)
    os.makedirs(args.out, exist_ok=True)
    checkpoints.save(os.path.join(args.out, "pcrnet"), pcr)
    print(f"wrote {args.out}/pcrnet")
    if sn is not None:
        checkpoints.save(os.path.join(args.out, "samplenet"), sn)
        cfg = infer_samplenet_config(sd)
        with open(os.path.join(args.out, "samplenet_config.json"), "w") as f:
            json.dump(cfg, f, indent=1)
        print(f"wrote {args.out}/samplenet (config: {cfg})")


if __name__ == "__main__":
    main()
