"""A/B the train-step memory-layout options on the real chip.

The B=1024 classification SampleNet train step is HBM-bandwidth-bound at
4.2% MFU (BENCHMARKS.md round-2 attribution): the C=64 f32 activations of
the simplification chain fill half a 128-lane tile, and XLA stashes them
for the backward pass. Two orthogonal, numerically-identical options:

  * remat       — jax.checkpoint around the sampler forward (recompute in
                  backward instead of stashing)
  * bcn layout  — channel-major chain (N on the lanes; full tiles)

    python benchmarks/bench_train_opts.py [--batch 1024] [--m 32]

Prints one JSON line per variant {baseline, remat, bcn, remat+bcn} plus a
loss-parity check, so the winner (if any) ships as the default with the
evidence attached.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from samplenet_tpu.utils.jax_setup import setup
    setup()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from measure import pipelined_rate
    from samplenet_tpu.models.pointnet_cls import PointNetClassifier
    from samplenet_tpu.train.classification import (
        SampleNetConfig,
        create_samplenet_state,
        make_samplenet_train_step,
    )
    from samplenet_tpu.train.state import clone_state

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--m", type=int, default=32)
    p.add_argument("--num-points", type=int, default=1024)
    args = p.parse_args()
    b, n, m = args.batch, args.num_points, args.m

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, n, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 24, b))
    key = jax.random.PRNGKey(3)

    classifier = PointNetClassifier(num_classes=24)
    c_vars = classifier.init(jax.random.PRNGKey(1), jnp.zeros((2, 64, 3)),
                             training=False)

    variants = {
        "baseline": {},
        "remat": {"remat": True},
        "bcn": {"conv_layout": "bcn"},
        "remat+bcn": {"remat": True, "conv_layout": "bcn"},
        # fused ghost-BN Pallas train chain: NOT loss-identical by design
        # (block-local statistics; see ops/pallas/point_mlp_train_kernel.py)
        "fused": {"fused_train": True},
        # frontier variants (round 4): ghost with f32 in-kernel matmuls,
        # and the exact-BN fused chain (loss-identical to baseline;
        # ops/pallas/point_mlp_exact_kernel.py) in both precisions
        "fused-ghost-f32": {"fused_train": True, "fused_bf16": False},
        "fused-exact": {"fused_train": True, "fused_mode": "exact"},
        "fused-exact-bf16": {"fused_train": True, "fused_mode": "exact",
                             "fused_bf16": True},
    }
    losses = {}
    only = os.environ.get("BENCH_VARIANTS")
    if only:
        keep = only.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}
    for name, opts in variants.items():
        scfg = SampleNetConfig(num_out_points=m, batch_size=b, **opts)
        sampler, state = create_samplenet_state(scfg, n,
                                                jax.random.PRNGKey(2))
        step = make_samplenet_train_step(sampler, classifier, c_vars, scfg,
                                         augment_data=True)
        # warm + loss parity probe on a fresh clone (steps donate state)
        _, metrics = step(clone_state(state), x, y, key)
        losses[name] = float(metrics["loss"])

        bench_state = {"s": clone_state(state)}

        def call():
            bench_state["s"], mm = step(bench_state["s"], x, y, key)
            return mm["loss"]

        res = pipelined_rate(call, [()], b)
        print(json.dumps({
            "variant": name,
            "ms_per_step": round(res["sec_per_call"] * 1e3, 3),
            "clouds_per_sec": round(res["rate"], 1),
            "spread": res["spread"],
            "loss0": round(losses[name], 6),
        }), flush=True)
    base = losses.get("baseline")
    if base is None:
        return
    for name, l in losses.items():
        if name.startswith("fused") and "exact" not in name:
            continue  # ghost-BN: semantically different stats, not drift
        if abs(l - base) > 1e-3 * max(1.0, abs(base)):
            print(json.dumps({"warning": f"loss drift in {name}",
                              "base": base, "got": l}), flush=True)


if __name__ == "__main__":
    main()
