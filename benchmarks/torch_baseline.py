"""Reference-equivalent SampleNet inference forward in torch on CPU.

Used only to produce the `vs_baseline` denominator for bench.py: an
independent implementation with the reference pipeline's structure
(registration/src/samplenet.py:82-141 — conv/BN/FC simplification net, 1-NN
against the input cloud, then the per-cloud host-side numpy matching loop
with order-preserving unique + FPS completion). Numbers are cached to
baseline_torch_cpu.json so the TPU bench doesn't re-time torch every run.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CACHE = os.path.join(os.path.dirname(__file__), "baseline_torch_cpu.json")


def _build_model(num_out: int, bottleneck: int):
    import torch
    import torch.nn as nn

    class Simplify(nn.Module):
        def __init__(self):
            super().__init__()
            widths = [3, 64, 64, 64, 128, bottleneck]
            self.convs = nn.ModuleList(
                [nn.Conv1d(a, b, 1) for a, b in zip(widths[:-1], widths[1:])]
            )
            self.cbns = nn.ModuleList([nn.BatchNorm1d(w) for w in widths[1:]])
            self.fcs = nn.ModuleList(
                [nn.Linear(bottleneck, 256), nn.Linear(256, 256),
                 nn.Linear(256, 256)]
            )
            self.fbns = nn.ModuleList([nn.BatchNorm1d(256) for _ in range(3)])
            self.out = nn.Linear(256, 3 * num_out)

        def forward(self, x):  # [B, 3, N]
            for conv, bn in zip(self.convs, self.cbns):
                x = torch.relu(bn(conv(x)))
            x = torch.max(x, 2)[0]
            for fc, bn in zip(self.fcs, self.fbns):
                x = torch.relu(bn(fc(x)))
            return self.out(x).view(-1, num_out, 3)

    return Simplify()


def _nn_matching_host(full_pc: np.ndarray, idx: np.ndarray, k: int) -> np.ndarray:
    """Host-side per-cloud matching loop, as the reference runs at eval."""
    out = np.zeros((full_pc.shape[0], k, 3), np.float32)
    for b in range(full_pc.shape[0]):
        _, first = np.unique(idx[b], return_index=True)
        uniq = idx[b][np.sort(first)]
        sel = full_pc[b][uniq]
        dist = ((full_pc[b][None] - sel[:, None]) ** 2).sum(-1).min(0)
        pts = list(sel)
        while len(pts) < k:
            far = int(np.argmax(dist))
            pts.append(full_pc[b][far])
            dist = np.minimum(dist, ((full_pc[b] - full_pc[b][far]) ** 2).sum(-1))
        out[b] = np.stack(pts[:k])
    return out


def measure(
    batch_size: int = 32, num_points: int = 1024, num_out: int = 32,
    iters: int = 10,
) -> float:
    """Returns sampled clouds/sec for the reference-style CPU eval forward."""
    import torch

    torch.manual_seed(0)
    model = _build_model(num_out, 128).eval()
    x = torch.randn(batch_size, 3, num_points)

    def one_pass():
        with torch.no_grad():
            simp = model(x)  # [B, m, 3]
            full = x.permute(0, 2, 1).contiguous()  # [B, N, 3]
            d = torch.cdist(simp, full)  # [B, m, N]
            idx = d.argmin(-1).numpy()
            _nn_matching_host(full.numpy(), idx, num_out)

    one_pass()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        one_pass()
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def get_baseline(**kwargs) -> float:
    key = "_".join(f"{k}={v}" for k, v in sorted(kwargs.items())) or "default"
    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
    if key not in cache:
        cache[key] = measure(**kwargs)
        with open(CACHE, "w") as f:
            json.dump(cache, f, indent=1)
    return cache[key]


if __name__ == "__main__":
    print(json.dumps({"clouds_per_sec_torch_cpu": measure()}))
