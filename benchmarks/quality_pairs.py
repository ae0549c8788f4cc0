"""Aggregate fused-vs-exact sampler quality runs into a pair table.

Reads the train_samplenet logs under <root>/<arm>_b<B>_s<seed>/ written by
the round-4 quality stage (exact / ghost / ghostf32 arms) and prints the
best-validation accuracy per run plus per-(B, seed) gaps vs the exact arm —
the evidence table behind the BENCHMARKS.md ghost-BN quality section.

    python benchmarks/quality_pairs.py log/q_r4
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def best_acc(run_dir: str) -> float | None:
    """`published checkpoint = best snapshot (eval_acc=0.1234, ...)` from the
    run log; falls back to the max test acc in metrics_samplenet.jsonl."""
    log = os.path.join(run_dir, "log_samplenet.txt")
    if os.path.exists(log):
        text = open(log).read()
        m = re.findall(r"best snapshot \(eval_acc=([0-9.]+)", text)
        if m:
            return float(m[-1])
    metrics = os.path.join(run_dir, "metrics_samplenet.jsonl")
    if os.path.exists(metrics):
        accs = [json.loads(l).get("test_acc") for l in open(metrics)]
        accs = [a for a in accs if a is not None]
        if accs:
            return max(accs)
    return None


def main(root: str) -> None:
    runs: dict[tuple[str, str, str], float] = {}
    for d in sorted(glob.glob(os.path.join(root, "*_b*_s*"))):
        name = os.path.basename(d)
        m = re.match(r"(\w+)_b(\d+)_s(\d+)$", name)
        if not m:
            continue
        acc = best_acc(d)
        if acc is not None:
            runs[(m.group(1), m.group(2), m.group(3))] = acc
    if not runs:
        print(f"no completed runs under {root}")
        return
    print(f"{'arm':<10} {'B':>5} {'seed':>4} {'best acc':>9} {'vs exact':>9}")
    for (arm, b, seed), acc in sorted(runs.items(),
                                      key=lambda kv: (kv[0][1], kv[0][2],
                                                      kv[0][0])):
        exact = runs.get(("exact", b, seed))
        gap = "" if (exact is None or arm == "exact") \
            else f"{(acc - exact) * 100:+.1f} pts"
        print(f"{arm:<10} {b:>5} {seed:>4} {acc:>9.4f} {gap:>9}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "log/q_r4")
