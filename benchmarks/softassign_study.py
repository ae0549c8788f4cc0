"""Aggregate the heavy-corruption loss study into a table.

Reads the metrics JSONL written by train_reconstruction's samplenet phase
under <root>/<corruption>_<loss>/sn/ (scripts/runner_softassign_study.sh)
and prints final-epoch denoising NRE per (corruption, loss) — the
epoch-matched comparison that either earns `--loss softassign` its README
billing at heavy corruption or records the negative result
(VERDICT r2 weak #4).
"""

from __future__ import annotations

import glob
import json
import os
import sys


def final_metric(sn_dir: str, key: str = "nre") -> float | None:
    files = glob.glob(os.path.join(sn_dir, "metrics_*.jsonl"))
    if not files:
        return None
    last = None
    with open(files[0]) as f:
        for line in f:
            rec = json.loads(line)
            if key in rec:
                last = rec[key]
    return last


def main(root: str) -> dict:
    corruptions = ("sigma05", "sigma10", "outlier10")
    losses = ("chamfer", "emd", "softassign")
    table: dict[str, dict[str, float]] = {}
    for c in corruptions:
        table[c] = {}
        for l in losses:
            v = final_metric(os.path.join(root, f"{c}_{l}", "sn"))
            if v is not None:
                table[c][l] = v
    if not any(table.values()):
        print(f"no study results under {root}")
        return {}
    print(f"{'corruption':<12}" + "".join(f"{l:>12}" for l in losses))
    for c in corruptions:
        row = "".join(
            f"{table[c].get(l, float('nan')):>12.4f}" for l in losses)
        print(f"{c:<12}{row}")
    return table


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "log/softassign_r3")
