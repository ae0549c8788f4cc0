"""bf16 end-to-end training study: quality vs speed on the procedural
24-class benchmark (CLAUDE.md round-2 item 3).

Trains the classifier and a SampleNet (m=32) twice each — f32 compute vs
bf16 compute (--bf16: activations/matmuls in bf16, params f32, distance ops
pinned to precision=HIGHEST either way) — with identical seeds/data, and
reports final accuracy + wall-clock per phase. One JSON line per row plus a
summary, mirroring quality_sweep.py.

    python benchmarks/bf16_study.py --out log/bf16_study
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from samplenet_tpu.utils.jax_setup import setup
    setup()

    p = argparse.ArgumentParser()
    p.add_argument("--out", default="log/bf16_study")
    p.add_argument("--epochs-cls", type=int, default=60)
    p.add_argument("--epochs-sn", type=int, default=150)
    p.add_argument("--train-size", type=int, default=4096)
    p.add_argument("--test-size", type=int, default=1024)
    p.add_argument("--m", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=32)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    results: list[dict] = []

    def emit(row: dict) -> None:
        results.append(row)
        print(json.dumps(row), flush=True)
        with open(os.path.join(args.out, "results.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")

    from samplenet_tpu.train import evaluate_cli, train_classifier
    from samplenet_tpu.train import train_samplenet

    common = ["--train-size", str(args.train_size),
              "--test-size", str(args.test_size),
              "--batch-size", str(args.batch_size)]

    for mode, flag in (("f32", []), ("bf16", ["--bf16"])):
        cls_dir = f"{args.out}/classifier_{mode}"
        t0 = time.perf_counter()
        train_classifier.main([
            "--epochs", str(args.epochs_cls), *common, *flag,
            "--log-dir", cls_dir])
        t_cls = time.perf_counter() - t0
        full = evaluate_cli.main([
            "classifier", "--ckpt", f"{cls_dir}/ckpt", "--num-votes", "1",
            *common, "--log-dir", f"{args.out}/eval"])
        emit({"row": f"classifier_{mode}", "accuracy": full["accuracy"],
              "train_wall_s": round(t_cls, 1)})

        sn_dir = f"{args.out}/samplenet_{mode}"
        t0 = time.perf_counter()
        train_samplenet.main([
            "--epochs", str(args.epochs_sn),
            "--num-out-points", str(args.m), *common, *flag,
            "--classifier-ckpt", f"{args.out}/classifier_f32/ckpt"
            if mode == "bf16" else f"{cls_dir}/ckpt",
            "--log-dir", sn_dir])
        t_sn = time.perf_counter() - t0
        r = evaluate_cli.main([
            "samplenet", "--ckpt", f"{sn_dir}/ckpt",
            "--classifier-ckpt", f"{args.out}/classifier_f32/ckpt"
            if mode == "bf16" else f"{cls_dir}/ckpt",
            "--num-out-points", str(args.m), *common,
            "--log-dir", f"{args.out}/eval"])
        emit({"row": f"samplenet{args.m}_{mode}", "accuracy": r["accuracy"],
              "train_wall_s": round(t_sn, 1)})

    table = {r["row"]: {"acc": round(r["accuracy"], 4),
                        "train_wall_s": r["train_wall_s"]} for r in results}
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(table, f, indent=1)
    print(json.dumps({"summary": table}))


if __name__ == "__main__":
    main()
