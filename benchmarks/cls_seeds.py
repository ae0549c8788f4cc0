"""Aggregate the multi-seed classification quality study into a table.

Reads the evaluate_cli logs under <root>/seed<k>/eval/ (FPS baseline +
SampleNet at m in {8, 16, 32, 64}; 3 fully independent seeds — fresh
procedural split and fresh init per seed, seed-matched frozen
classifier, same protocol as the registration study; completed round 5)
and prints per-m mean ± std with the per-seed SampleNet-vs-FPS
ordering, mirroring `registration_seeds.py`. Published in BENCHMARKS.md
"Multi-seed classification study".

    python benchmarks/cls_seeds.py log/clsq_r4
"""

from __future__ import annotations

import glob
import os
import re
import sys

import numpy as np


def parse_eval_log(path: str) -> dict[tuple[str, int], float]:
    """{(sampler, m): accuracy} from an eval log dir's text logs."""
    out: dict[tuple[str, int], float] = {}
    for log in glob.glob(os.path.join(path, "log_eval_*.txt")):
        for line in open(log):
            m = re.search(r"fps baseline accuracy@(\d+): ([0-9.]+)", line)
            if m:
                out[("fps", int(m.group(1)))] = float(m.group(2))
            m = re.search(
                r"matched accuracy@(\d+) \(nn matching\): ([0-9.]+)", line)
            if m:
                out[("samplenet", int(m.group(1)))] = float(m.group(2))
    return out


def main(root: str) -> None:
    seeds: dict[int, dict[tuple[str, int], float]] = {}
    for d in sorted(glob.glob(os.path.join(root, "seed*"))):
        k = int(re.search(r"seed(\d+)", d).group(1))
        rows = parse_eval_log(os.path.join(d, "eval"))
        if rows:
            seeds[k] = rows
    if not seeds:
        sys.exit(f"no eval logs under {root}")

    ms = sorted({m for rows in seeds.values() for (_, m) in rows})
    print(f"{'row':<14}{'acc (mean +- std)':<22}n  per-seed")
    for m in ms:
        for sampler in ("fps", "samplenet"):
            vals = [(k, rows[(sampler, m)]) for k, rows in sorted(seeds.items())
                    if (sampler, m) in rows]
            if not vals:
                continue
            accs = np.asarray([v for _, v in vals])
            per = " ".join(f"{v:.4f}" for _, v in vals)
            print(f"{sampler}@{m:<9}{accs.mean():.4f} +- {accs.std(ddof=1) if len(accs) > 1 else 0.0:.4f}"
                  f"        {len(accs)}  {per}")
    for m in ms:
        pairs = [
            (k, rows[("samplenet", m)], rows[("fps", m)])
            for k, rows in sorted(seeds.items())
            if ("samplenet", m) in rows and ("fps", m) in rows
        ]
        if pairs:
            wins = sum(1 for _, s, f in pairs if s > f)
            print(f"m={m}: SampleNet beats FPS in {wins}/{len(pairs)} seeds")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "log/clsq_r4")
