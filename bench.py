"""Headline benchmark: sampled clouds/sec/chip, SampleNet 1024 -> 32 eval
forward (simplification net + on-device hard matching). Prints ONE JSON line.

Methodology: the TPU here sits behind a tunnel with ~33 ms host round-trip
latency, and `block_until_ready` does NOT synchronise through it — so the
benchmark (a) forces a real sync by pulling a scalar to the host, and
(b) pipelines many dispatches between syncs, as a production serving loop
would (device programs execute in enqueue order, so syncing the last output
bounds the whole pipeline).

`vs_baseline` = our clouds/sec over a reference-equivalent torch CPU forward
(benchmarks/torch_baseline.py — same network shape, host-side matching loop
like registration/src/samplenet.py:119-141), cached after first measurement.
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

    batch, num_points, num_out = 1024, 1024, 32
    net = SampleNet(num_out_points=num_out, bottleneck_size=128, group_size=7)
    rng = np.random.RandomState(0)
    xs = [
        jnp.asarray(rng.randn(batch, num_points, 3).astype(np.float32))
        for _ in range(4)
    ]
    variables = net.init(jax.random.PRNGKey(0), xs[0][:2], training=False)

    fwd = jax.jit(lambda v, x: net.apply(v, x, training=False)[1])
    float(jnp.sum(fwd(variables, xs[0])))  # compile + real sync

    iters = 32
    best = 0.0
    for _trial in range(3):
        t0 = time.perf_counter()
        outs = [fwd(variables, xs[i % len(xs)]) for i in range(iters)]
        float(jnp.sum(outs[-1]))  # forces execution of the whole pipeline
        dt = time.perf_counter() - t0
        best = max(best, batch * iters / dt)

    try:
        sys.path.insert(0, "benchmarks")
        from torch_baseline import get_baseline

        baseline = get_baseline(
            batch_size=32, num_points=num_points, num_out=num_out)
        vs = best / baseline
    except Exception:
        vs = float("nan")

    print(json.dumps({
        "metric": "sampled clouds/sec/chip (1024->32, eval fwd + hard matching)",
        "value": round(best, 1),
        "unit": "clouds/sec",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
