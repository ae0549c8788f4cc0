"""Headline benchmark: sampled clouds/sec/chip, SampleNet 1024 -> 32 eval
forward (simplification net + on-device hard matching). Prints ONE JSON line.

Methodology (benchmarks/measure.py): the TPU sits behind a tunnel with
~33 ms host round-trip latency and `block_until_ready` does NOT synchronise
through it — so the benchmark forces real syncs by pulling a scalar, keeps a
deep dispatch pipeline between syncs, and adaptively doubles the pipeline
depth until the run-to-run spread is <5% AND the rate gain over the previous
depth is <3%, publishing the converged-plateau round (published numbers must
carry neither tunnel-scheduling jitter nor stopping-depth dependence; the
full depth curve is included for auditing).

`vs_baseline` = our clouds/sec over a GENEROUS estimate of the reference
CUDA pipeline (benchmarks/cuda_baseline_estimate.py: V100 roofline for the
GPU stages + this host's measured numpy matching loop, which the reference
runs per cloud mid-forward, registration/src/samplenet.py:119-141). The
torch-CPU forward ratio and the pure-GPU-roofline bound are reported as
extra fields for context.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "benchmarks"))


def main() -> None:
    from samplenet_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup()
    import jax
    import jax.numpy as jnp

    from measure import pipelined_rate
    from samplenet_tpu.models import SampleNet

    batch, num_points, num_out = 1024, 1024, 32
    net = SampleNet(num_out_points=num_out, bottleneck_size=128, group_size=7)
    rng = np.random.RandomState(0)
    xs = [
        jnp.asarray(rng.randn(batch, num_points, 3).astype(np.float32))
        for _ in range(4)
    ]
    variables = net.init(jax.random.PRNGKey(0), xs[0][:2], training=False)

    fwd = jax.jit(lambda v, x: net.apply(v, x, training=False)[1])
    # max_rounds=7 lets the curve reach depth 2048: the r5 traced device
    # bound is 1.464 ms/step (699k clouds/sec; benchmarks/profile_step.py
    # --variant eval) and depth 1024 measures 684k with a 3.1% last gain —
    # one more doubling converges the plateau against that bound.
    res = pipelined_rate(lambda x: fwd(variables, x), [(x,) for x in xs],
                         batch, min_iters=32, max_rounds=7)

    # Peak device throughput at B=4096: the same program with dispatch
    # overhead amortised over 4x the work per call (measured curve:
    # ~400k at B=1024 -> 464k at B=2048 -> ~556k at B=4096). The B=1024
    # number stays the published headline for cross-round continuity;
    # the peak is reported alongside as device truth.
    peak = None
    try:
        xb = [jnp.asarray(rng.randn(4096, num_points, 3).astype(np.float32))
              for _ in range(2)]
        peak = pipelined_rate(lambda x: fwd(variables, x),
                              [(x,) for x in xb], 4096, min_iters=8)
    except Exception:
        pass

    extras = {}
    vs = float("nan")
    try:
        from cuda_baseline_estimate import get_estimate

        est = get_estimate(batch=32, n=num_points, m=num_out)
        vs = res["rate"] / est["clouds_per_sec"]
        extras["cuda_baseline_est"] = est["clouds_per_sec"]
        extras["vs_gpu_only_roofline"] = round(
            res["rate"] / est["gpu_only_bound_clouds_per_sec"], 2)
    except Exception:
        pass
    try:
        from torch_baseline import get_baseline

        cpu = get_baseline(batch_size=32, num_points=num_points,
                           num_out=num_out)
        extras["vs_torch_cpu"] = round(res["rate"] / cpu, 1)
    except Exception:
        pass

    if peak is not None:
        extras["peak_clouds_per_sec_b4096"] = round(peak["rate"], 1)
        extras["peak_spread"] = peak["spread"]

    print(json.dumps({
        "metric": "sampled clouds/sec/chip (1024->32, eval fwd + hard matching)",
        "value": round(res["rate"], 1),
        "unit": "clouds/sec",
        "vs_baseline": round(vs, 2),
        "baseline": "reference CUDA pipeline estimate "
                    "(V100 roofline + measured host matching)",
        "measurement_spread": res["spread"],
        "pipeline_iters": res["iters"],
        "converged": res.get("converged"),
        "depth_curve": res.get("depth_curve"),
        **extras,
    }))


if __name__ == "__main__":
    main()
