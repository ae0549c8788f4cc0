"""Eval-forward compute-dtype experiment: f32 vs bf16 simplification net.

The headline eval forward (1024 -> 32, B=1024) is HBM-bandwidth-bound in the
simplification network (activations [1024, 1024, 128] f32 are ~0.5 GB per
layer); bf16 activations halve that traffic. Distance/matching stays f32
precision=HIGHEST either way. This prints rate + a quality check: fraction
of matched indices that differ between the two dtypes on the same weights,
and (optionally, given checkpoints) the eval-accuracy delta.

    python benchmarks/bench_eval_dtype.py [--batch 1024] [--m 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from samplenet_tpu.utils.jax_setup import setup
    setup()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from measure import pipelined_rate
    from samplenet_tpu.models import SampleNet

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--num-points", type=int, default=1024)
    p.add_argument("--m", type=int, default=32)
    args = p.parse_args()

    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.randn(args.batch, args.num_points, 3),
                      jnp.float32) for _ in range(4)]

    results = {}
    idx_by_mode = {}
    for mode, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        net = SampleNet(num_out_points=args.m, bottleneck_size=128,
                        group_size=7, dtype=dtype)
        # identical params: init is dtype-independent (params stay f32)
        variables = net.init(jax.random.PRNGKey(0), xs[0][:2], training=False)
        fwd = jax.jit(lambda v, x, n=net: n.apply(v, x, training=False)[1])
        res = pipelined_rate(lambda x: fwd(variables, x),
                             [(x,) for x in xs], args.batch, min_iters=32)
        results[mode] = res
        out = np.asarray(jax.device_get(fwd(variables, xs[0])))
        idx_by_mode[mode] = out
        print(json.dumps({"mode": mode, "rate": round(res["rate"]),
                          "spread": res["spread"], "iters": res["iters"]}),
              flush=True)

    # quality: how many matched points differ between dtypes (same weights)?
    diff = np.mean(np.any(idx_by_mode["f32"] != idx_by_mode["bf16"], axis=-1))
    print(json.dumps({
        "speedup_bf16": round(results["bf16"]["rate"] / results["f32"]["rate"], 3),
        "fraction_points_changed": round(float(diff), 5),
    }))


if __name__ == "__main__":
    main()
