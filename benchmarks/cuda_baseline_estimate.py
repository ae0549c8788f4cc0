"""Defensible reference-GPU (CUDA) throughput estimate for BASELINE config 1.

The north star is ">=10x the CUDA baseline" — the reference's GPU pipeline,
not a torch-CPU stand-in. No NVIDIA GPU exists in this environment, so this
module produces a deliberately GENEROUS upper bound on what the reference
could do on paper-era hardware, decomposing its eval pipeline
(registration/src/samplenet.py:82-141) into:

  t_batch = t_gpu(simplification net + 1-NN)    [roofline upper bound]
          + t_host(per-cloud numpy matching)    [measured on this host]

GPU part — roofline from the actual layer shapes (samplenet.py:40-59:
1x1 convs 3-64-64-64-128-128, FC head 128-256-256-256-3m) plus the 1-NN
distance pass (KNN_CUDA; the TF path builds the same B x m x N distances,
grouping/tf_grouping.py:64-91). We charge a V100's 15.7 fp32 TFLOP/s at a
generous 40% sustained utilisation — real TF-1.13 small-batch graphs are
kernel-launch-bound well below that, so the bound is safely in the
reference's favour.

Host part — the reference copies to numpy MID-FORWARD and runs
order-preserving unique + FPS completion per cloud on the host
(samplenet.py:123-141, sputils.py:11-41). That loop is inherent to the
reference's eval path and serializes with the GPU; we measure the
reference's own algorithm on this machine's CPU.

Run:  python benchmarks/cuda_baseline_estimate.py
Cache: benchmarks/cuda_baseline.json (consumed by bench.py's vs_baseline).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CACHE = os.path.join(os.path.dirname(__file__), "cuda_baseline.json")

V100_FP32_TFLOPS = 15.7
GENEROUS_MFU = 0.40


def gpu_forward_flops(batch: int, n: int, m: int, bottleneck: int = 128) -> float:
    """FLOPs of the reference GPU work per batch (matmuls + 1-NN)."""
    conv_widths = [3, 64, 64, 64, 128, bottleneck]
    conv = 2 * n * sum(a * b for a, b in zip(conv_widths[:-1], conv_widths[1:]))
    fc_widths = [bottleneck, 256, 256, 256, 3 * m]
    fc = 2 * sum(a * b for a, b in zip(fc_widths[:-1], fc_widths[1:]))
    nn1 = 8 * m * n  # squared-distance + running-min pass over all pairs
    return float(batch * (conv + fc + nn1))


def measure_host_matching(
    batch: int, n: int, m: int, iters: int = 8, seed: int = 0
) -> float:
    """Seconds per batch for the reference's numpy matching loop
    (unique + seeded FPS completion, sputils.py:11-41), with a realistic
    duplicate-index distribution (1-NN of a regressed simplified cloud)."""
    from torch_baseline import _nn_matching_host

    rng = np.random.RandomState(seed)
    full = rng.randn(batch, n, 3).astype(np.float32)
    simp = rng.randn(batch, m, 3).astype(np.float32) * 0.7
    d = ((simp[:, :, None, :] - full[:, None, :, :]) ** 2).sum(-1)
    idx = d.argmin(-1)
    _nn_matching_host(full, idx, m)  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        _nn_matching_host(full, idx, m)
    return (time.perf_counter() - t0) / iters


def estimate(batch: int = 32, n: int = 1024, m: int = 32) -> dict:
    t_gpu = gpu_forward_flops(batch, n, m) / (
        V100_FP32_TFLOPS * 1e12 * GENEROUS_MFU)
    t_host = measure_host_matching(batch, n, m)
    rate = batch / (t_gpu + t_host)
    return {
        "clouds_per_sec": round(rate, 1),
        # bound if the host matching loop were FREE — the reference pipeline
        # cannot exceed this even with an infinitely fast rewrite of its
        # numpy stage, since the GPU fwd work remains:
        "gpu_only_bound_clouds_per_sec": round(batch / t_gpu, 1),
        "t_gpu_roofline_ms": round(t_gpu * 1e3, 4),
        "t_host_matching_ms": round(t_host * 1e3, 3),
        "assumptions": {
            "gpu": f"V100 fp32 {V100_FP32_TFLOPS} TFLOP/s",
            "sustained_mfu": GENEROUS_MFU,
            "host_loop": "reference numpy unique+FPS (sputils.py:11-41), "
                         "measured on this machine",
        },
        "batch": batch, "n": n, "m": m,
    }


def get_estimate(batch: int = 32, n: int = 1024, m: int = 32) -> dict:
    key = f"b{batch}_n{n}_m{m}"
    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
    if key not in cache:
        cache[key] = estimate(batch, n, m)
        with open(CACHE, "w") as f:
            json.dump(cache, f, indent=1)
    return cache[key]


if __name__ == "__main__":
    for m in (32, 64):
        print(json.dumps({f"cuda_estimate_m{m}": get_estimate(m=m)}))
