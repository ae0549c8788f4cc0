"""Aggregate the multi-seed reconstruction quality study into a table.

Completes the multi-seed symmetry across the three quality tracks
(classification and registration got theirs in rounds 4-5): 3 fully
independent seeds — fresh procedural split and fresh init per seed,
seed-matched frozen AE — each training the m-point SampleNet sampler
against its own frozen 2048-pt AE (100 epochs per phase, N=2048, B=50,
500/100 split, the AE-track protocol) and scoring NRE on the test split
alongside the in-CLI FPS baseline through the same frozen AE (the
paper's comparison point; reference reconstruction/sampler/
evaluate_samplenet.py scores SampleNet NRE against FPS through one AE).

Reads `log_samplenet.txt` under <root>/seed<k>/sn<m>/ (final-epoch NRE +
`FPS baseline @m:` line) and prints per-m mean ± std with the per-seed
SampleNet-vs-FPS ordering, mirroring `registration_seeds.py` /
`cls_seeds.py`. Published in BENCHMARKS.md "Multi-seed reconstruction
study".

    python benchmarks/recon_seeds.py log/recq_r5
"""

from __future__ import annotations

import glob
import os
import re
import sys

import numpy as np


def parse_run_log(run_dir: str) -> dict[str, float]:
    """{'samplenet': final-epoch NRE, 'fps': FPS-baseline NRE}."""
    out: dict[str, float] = {}
    path = os.path.join(run_dir, "log_samplenet.txt")
    if not os.path.exists(path):
        return out
    for line in open(path):
        m = re.search(r"epoch \d+: .*\| NRE=([0-9.]+)", line)
        if m:  # keep the LAST epoch's eval (the published statistic)
            out["samplenet"] = float(m.group(1))
        m = re.search(r"FPS baseline @\d+: NRE=([0-9.]+)", line)
        if m:
            out["fps"] = float(m.group(1))
    return out


def main(root: str) -> None:
    # {(seed, m): {'samplenet': nre, 'fps': nre}}
    runs: dict[tuple[int, int], dict[str, float]] = {}
    for d in sorted(glob.glob(os.path.join(root, "seed*", "sn*"))):
        sk = re.search(r"seed(\d+)[/\\]sn(\d+)$", d)
        if not sk:
            continue
        rows = parse_run_log(d)
        if rows:
            runs[(int(sk.group(1)), int(sk.group(2)))] = rows
    if not runs:
        sys.exit(f"no sampler logs under {root}")

    ms = sorted({m for (_, m) in runs})
    seeds = sorted({s for (s, _) in runs})
    print(f"seeds: {seeds}")
    print(f"{'row':<16}{'NRE (mean +- std)':<24}n  per-seed")
    for m in ms:
        for sampler in ("fps", "samplenet"):
            vals = [(s, runs[(s, m)][sampler]) for s in seeds
                    if (s, m) in runs and sampler in runs[(s, m)]]
            if not vals:
                continue
            nres = np.asarray([v for _, v in vals])
            std = nres.std(ddof=1) if len(nres) > 1 else 0.0
            per = " ".join(f"{v:.3f}" for _, v in vals)
            print(f"{sampler}@{m:<10}{nres.mean():.3f} +- {std:.3f}"
                  f"           {len(nres)}  {per}")
    # per-seed ordering at each m: does SampleNet beat FPS every seed?
    for m in ms:
        wins = sum(
            1 for s in seeds
            if (s, m) in runs
            and {"samplenet", "fps"} <= runs[(s, m)].keys()
            and runs[(s, m)]["samplenet"] < runs[(s, m)]["fps"])
        total = sum(1 for s in seeds if (s, m) in runs
                    and {"samplenet", "fps"} <= runs[(s, m)].keys())
        print(f"samplenet < fps @ m={m}: {wins}/{total} seeds")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "log/recq_r5")
