"""Headline benchmark: sampled clouds/sec/chip, SampleNet 1024 -> 32 eval
forward (simplification net + on-device hard matching), on the local
accelerator. Prints ONE JSON line.

`vs_baseline` = our clouds/sec divided by a reference-equivalent torch CPU
forward (benchmarks/torch_baseline.py — same network shape, host-side
matching loop like registration/src/samplenet.py:119-141), cached after
first measurement.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    from samplenet_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup()
    import jax
    import jax.numpy as jnp

    from samplenet_tpu.models import SampleNet

    batch, num_points, num_out = 256, 1024, 32
    net = SampleNet(num_out_points=num_out, bottleneck_size=128, group_size=7)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, num_points, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x[:2], training=False)

    fwd = jax.jit(lambda v, x: net.apply(v, x, training=False)[1])
    jax.block_until_ready(fwd(variables, x))  # compile + warmup

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    clouds_per_sec = batch * iters / dt

    try:
        sys.path.insert(0, "benchmarks")
        from torch_baseline import get_baseline

        baseline = get_baseline(
            batch_size=32, num_points=num_points, num_out=num_out)
        vs = clouds_per_sec / baseline
    except Exception:
        vs = float("nan")

    print(json.dumps({
        "metric": "sampled clouds/sec/chip (1024->32, eval fwd + hard matching)",
        "value": round(clouds_per_sec, 1),
        "unit": "clouds/sec",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
