"""Serving benchmark: MicroBatcher under closed-loop concurrent clients.

Re-measures the BENCHMARKS.md serving table (r2-vintage — predates the
fused eval kernel and the r4 matching reworks) on current code, and adds
the ArtifactSampler path (frozen StableHLO artifact, no model code) under
the same load. Protocol matches r2: N closed-loop clients each submit one
1024-point cloud and block on the Future, repeatedly, for `--seconds`;
throughput = completed requests / elapsed, latency quantiles per request.

    python benchmarks/bench_serving.py [--seconds 20] [--clients 8 64 128]

One JSON line per (engine, clients) pair.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_load(batcher, clouds, n_clients: int, seconds: float) -> dict:
    stop = time.monotonic() + seconds
    lock = threading.Lock()
    lats: list[float] = []

    def client(i: int) -> None:
        k = i
        while time.monotonic() < stop:
            t0 = time.monotonic()
            batcher.submit(clouds[k % len(clouds)]).result()
            with lock:
                lats.append(time.monotonic() - t0)
            k += n_clients

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.monotonic() - t0
    lats.sort()
    q = lambda p: lats[min(len(lats) - 1, int(p * len(lats)))]
    return {"clients": n_clients, "clouds_per_sec": round(len(lats) / elapsed, 1),
            "requests": len(lats), "p50_ms": round(q(0.50) * 1e3, 1),
            "p99_ms": round(q(0.99) * 1e3, 1)}


def main() -> None:
    from samplenet_tpu.utils.jax_setup import setup
    setup()
    import jax
    import numpy as np

    from samplenet_tpu.models import SampleNet
    from samplenet_tpu.serving import (ArtifactSampler, BatchedSampler,
                                       MicroBatcher, save_exported)

    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--clients", type=int, nargs="+", default=[8, 64, 128])
    p.add_argument("--max-batch", type=int, default=256)
    p.add_argument("--num-points", type=int, default=1024)
    p.add_argument("--num-out", type=int, default=32)
    args = p.parse_args()

    rng = np.random.RandomState(0)
    clouds = [rng.randn(args.num_points, 3).astype(np.float32)
              for _ in range(512)]
    net = SampleNet(num_out_points=args.num_out, bottleneck_size=128,
                    group_size=7)
    import jax.numpy as jnp
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((2, args.num_points, 3)), training=False)
    device = str(jax.devices()[0])

    sampler = BatchedSampler(net, variables, max_batch=args.max_batch,
                             num_points=args.num_points)
    for n in args.clients:
        mb = MicroBatcher(sampler, max_wait_ms=5.0, pipeline_depth=4)
        run_load(mb, clouds, min(n, 8), 2.0)  # warm
        res = run_load(mb, clouds, n, args.seconds)
        mb.close()
        print(json.dumps({"engine": "checkpoint", "device": device,
                          "max_batch": args.max_batch, **res}), flush=True)

    # frozen StableHLO artifact path (serve-daemon deployment format)
    path = os.path.join(tempfile.mkdtemp(prefix="bench_serving_"),
                        "sampler.snart")
    save_exported(path, net, variables, batch=args.max_batch,
                  num_points=args.num_points, freeze_params=True)
    art = ArtifactSampler(path)
    n = args.clients[len(args.clients) // 2]
    mb = MicroBatcher(art, max_wait_ms=5.0, pipeline_depth=4)
    run_load(mb, clouds, min(n, 8), 2.0)
    res = run_load(mb, clouds, n, args.seconds)
    mb.close()
    print(json.dumps({"engine": "artifact", "device": device,
                      "max_batch": args.max_batch, **res}), flush=True)


if __name__ == "__main__":
    main()
