"""Aggregate multi-seed registration runs into a mean +- std table.

Reads the report.json files written by train_registration under
<root>/seed*/{pcrnet,samplenet<m>}/ (scripts/runner_registration_r3.sh)
and prints, per m: SampleNet vs FPS vs full-cloud rotation error / AUC,
mean +- std ACROSS SEEDS, plus the per-seed ordering so the stability of
the SampleNet>FPS claim is auditable (VERDICT r2 weak #2).
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np


def collect(root: str) -> dict:
    seeds = sorted(glob.glob(os.path.join(root, "seed*")))
    rows: dict[str, dict[str, list]] = {}

    def add(key, metric_dict):
        if metric_dict is None:
            return
        rows.setdefault(key, {"rot": [], "auc": []})
        rows[key]["rot"].append(metric_dict["rot_err_mean"])
        rows[key]["auc"].append(metric_dict["auc"])

    for sd in seeds:
        pcr = os.path.join(sd, "pcrnet", "report.json")
        if os.path.exists(pcr):
            r = json.load(open(pcr))
            add("full", r.get("full_iter1"))
            for k, v in r.items():
                if k.startswith("fps") and k.endswith("_iter1"):
                    add(k.replace("_iter1", ""), v)
        for sn in sorted(glob.glob(os.path.join(sd, "samplenet*"))):
            rep = os.path.join(sn, "report.json")
            if os.path.exists(rep):
                m = os.path.basename(sn).replace("samplenet", "")
                add(f"samplenet{m}", json.load(open(rep))["best"])
    return rows


def main(root: str) -> dict:
    rows = collect(root)
    if not rows:
        print(f"no report.json files under {root}")
        return {}
    out = {}
    print(f"{'input':<14} {'rot err (deg)':<18} {'AUC':<16} n  per-seed rot")
    for key in sorted(rows, key=lambda k: (k != "full", k)):
        rot = np.asarray(rows[key]["rot"])
        auc = np.asarray(rows[key]["auc"])
        out[key] = {"rot_mean": float(rot.mean()), "rot_std": float(rot.std()),
                    "auc_mean": float(auc.mean()), "auc_std": float(auc.std()),
                    "n_seeds": len(rot), "rot_per_seed": rot.tolist()}
        print(f"{key:<14} {rot.mean():6.2f} +- {rot.std():5.2f}     "
              f"{auc.mean():.4f} +- {auc.std():.4f}  {len(rot)}  "
              + " ".join(f"{r:.2f}" for r in rot))
    # ordering stability: SampleNet vs FPS per m per seed
    for m in (16, 32, 64):
        sn, fp = out.get(f"samplenet{m}"), out.get(f"fps{m}")
        if sn and fp and sn["n_seeds"] == fp["n_seeds"]:
            wins = sum(s < f for s, f in
                       zip(sn["rot_per_seed"], fp["rot_per_seed"]))
            print(f"m={m}: SampleNet beats FPS on rot err in "
                  f"{wins}/{sn['n_seeds']} seeds")
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "log/reg_r3")
