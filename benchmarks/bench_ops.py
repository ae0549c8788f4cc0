"""Op-level microbenchmarks (the reference keeps a CUDA testbed under
classification/grouping/test/ plus per-op timing mains; this is the unified
equivalent). Prints one JSON line per op.

    python benchmarks/bench_ops.py [--batch 64] [--n 1024] [--m 64]

Note: timings force a host sync via a scalar pull — block_until_ready does
not synchronise through the TPU tunnel (see bench.py) — and pipeline several
dispatches between syncs to amortise the ~33 ms round trip.
"""

from __future__ import annotations

import argparse
import json
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters: int = 20) -> float:
    """Returns ms/call with pipelined dispatch + one trailing sync."""
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    from samplenet_tpu.utils.jax_setup import setup
    setup()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from samplenet_tpu import ops
    from samplenet_tpu.ops.pallas import fused_soft_projection

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--m", type=int, default=64)
    p.add_argument("--k", type=int, default=7)
    args = p.parse_args()

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, args.n, 3).astype(np.float32))
    y = jnp.asarray(rng.randn(args.batch, args.m, 3).astype(np.float32))
    sigma = jnp.asarray(0.5)

    cases = {
        "nn_distance": jax.jit(lambda a, b: ops.nn_distance(a, b)[0]),
        "knn_point": jax.jit(lambda a, b: ops.knn_point(args.k, a, b)[0]),
        "group_point": None,  # depends on knn output, built below
        "farthest_point_sample": jax.jit(
            lambda a: ops.farthest_point_sample(args.m, a)),
        "nn_match_from_clouds": jax.jit(
            lambda a, b: ops.nn_match_from_clouds(a, b, args.m)[0]),
        "approx_match": jax.jit(lambda a, b: ops.approx_match(a, b)),
        "emd_cost_pallas": None,  # built below (module import)
        "soft_projection_xla": None,
        "soft_projection_pallas": jax.jit(
            lambda a, b: fused_soft_projection(a, b, sigma,
                                               group_size=args.k)[0]),
    }

    _, idx = ops.knn_point(args.k, x, y)
    cases["group_point"] = jax.jit(lambda a: ops.group_point(a, idx))

    def xla_proj(a, b):
        d, i = ops.knn_point(args.k, a, b)
        w = jax.nn.softmax(-d / sigma, -1)
        return jnp.sum(ops.group_point(a, i) * w[..., None], axis=2)

    cases["soft_projection_xla"] = jax.jit(xla_proj)

    from samplenet_tpu.ops.pallas.emd_kernel import emd_cost_pallas
    cases["emd_cost_pallas"] = jax.jit(
        lambda a, b: emd_cost_pallas(a, b, with_grads=True)[0])

    shape_info = f"B={args.batch} N={args.n} M={args.m} k={args.k}"
    for name, fn in cases.items():
        if name in ("farthest_point_sample", "group_point"):
            ms = timeit(fn, x)
        elif name in ("approx_match", "emd_cost_pallas"):
            ms = timeit(fn, x[:, : min(args.n, 256)], y)
        else:
            ms = timeit(fn, x, y)
        print(json.dumps({"op": name, "ms_per_call": round(ms, 3),
                          "shapes": shape_info,
                          "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
