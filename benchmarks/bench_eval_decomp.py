"""Decompose the headline eval forward (B=1024, 1024->m, hard matching)
into its stages: simplification net, 1-NN, unique+FPS completion, gather.
One JSON line per stage + the fused forward, same methodology as
bench_train_decomp.py (fastest-3 pipelined timing).

    python benchmarks/bench_eval_decomp.py [--batch 1024] [--m 32]
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
    from samplenet_tpu.models import SampleNet
    from samplenet_tpu.ops.dispatch import pallas_backend_ok
    from samplenet_tpu.ops.fps import gather_point
    from samplenet_tpu.ops.matching import (
        chunked_min_argmin, nn_match_indices)

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--m", type=int, default=32)
    p.add_argument("--num-points", type=int, default=1024)
    args = p.parse_args()
    b, n, m = args.batch, args.num_points, args.m

    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.randn(b, n, 3), jnp.float32) for _ in range(4)]
    simp = jnp.asarray(rng.randn(b, m, 3), jnp.float32)
    idx = jnp.asarray(rng.randint(0, n, (b, m)), jnp.int32)

    net = SampleNet(num_out_points=m, bottleneck_size=128, group_size=7)
    v = net.init(jax.random.PRNGKey(0), xs[0][:2], training=False)

    def report(stage, res):
        print(json.dumps({"stage": stage,
                          "ms_per_call": round(res["sec_per_call"] * 1e3, 3),
                          "spread": res["spread"], "iters": res["iters"]}),
              flush=True)

    def run(stage, fn):
        res = pipelined_rate(jax.jit(fn), [(x,) for x in xs], b, min_iters=24)
        report(stage, res)

    # 1. simplification net only
    run("simplification_net",
        lambda x: net.apply(v, x, training=False, method=SampleNet.simplify))

    # 2. 1-NN simplified -> full cloud
    if pallas_backend_ok():
        from samplenet_tpu.ops.pallas import nn_direction
        run("1nn_pallas", lambda x: nn_direction(simp, x, tile_x=m)[1])
    run("1nn_xla", lambda x: chunked_min_argmin(simp, x)[1])

    # 3. unique + seeded-FPS completion (from fixed indices)
    run("unique_fps_complete",
        lambda x: nn_match_indices(x, idx, m, complete_fps=True))

    # 4. final gather
    run("gather", lambda x: gather_point(x, idx))

    # 5. fused full eval forward
    run("full_eval_forward",
        lambda x: net.apply(v, x, training=False)[1])


if __name__ == "__main__":
    main()
