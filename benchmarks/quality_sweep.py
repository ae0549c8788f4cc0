"""Quality sweep on the procedural 24-class benchmark: SampleNet vs FPS vs
random at m = 8/16/32/64, plus progressive prefixes. Writes one JSON line
per result and a summary table to --out.

    python benchmarks/quality_sweep.py --out /tmp/quality \
        [--epochs-cls 60] [--epochs-sn 120] [--train-size 4096]

The FPS/random rows use the same frozen classifier and the same full-
coverage eval protocol (docs/EVAL_PROTOCOL.md), so the comparison isolates
the sampler.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from samplenet_tpu.utils.jax_setup import setup
    setup()

    p = argparse.ArgumentParser()
    p.add_argument("--out", default="log/quality")
    p.add_argument("--epochs-cls", type=int, default=60)
    p.add_argument("--epochs-sn", type=int, default=120)
    p.add_argument("--epochs-prog", type=int, default=200)
    p.add_argument("--train-size", type=int, default=4096)
    p.add_argument("--test-size", type=int, default=1024)
    p.add_argument("--ms", type=int, nargs="+", default=[8, 16, 32, 64])
    p.add_argument("--classifier-ckpt", default=None,
                   help="reuse an existing classifier checkpoint")
    p.add_argument("--skip-progressive", action="store_true")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    results: list[dict] = []

    def emit(row: dict) -> None:
        results.append(row)
        print(json.dumps(row), flush=True)
        with open(os.path.join(args.out, "results.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")

    common = ["--train-size", str(args.train_size),
              "--test-size", str(args.test_size)]

    from samplenet_tpu.train import evaluate_cli, train_classifier
    from samplenet_tpu.train import train_progressive, train_samplenet

    cls_ckpt = args.classifier_ckpt
    if cls_ckpt is None:
        train_classifier.main([
            "--epochs", str(args.epochs_cls), *common,
            "--log-dir", f"{args.out}/classifier"])
        cls_ckpt = f"{args.out}/classifier/ckpt"
    full = evaluate_cli.main([
        "classifier", "--ckpt", cls_ckpt, "--num-votes", "1",
        *common, "--log-dir", f"{args.out}/eval"])
    emit({"row": "classifier_full_input", "accuracy": full["accuracy"]})

    for m in args.ms:
        for sampler in ("fps", "random"):
            r = evaluate_cli.main([
                "baseline", "--sampler", sampler, "--classifier-ckpt",
                cls_ckpt, "--num-out-points", str(m), *common,
                "--log-dir", f"{args.out}/eval"])
            emit({"row": f"{sampler}@{m}", "accuracy": r["accuracy"]})

        train_samplenet.main([
            "--epochs", str(args.epochs_sn), "--num-out-points", str(m),
            *common, "--classifier-ckpt", cls_ckpt,
            "--log-dir", f"{args.out}/samplenet{m}"])
        r = evaluate_cli.main([
            "samplenet", "--ckpt", f"{args.out}/samplenet{m}/ckpt",
            "--classifier-ckpt", cls_ckpt, "--num-out-points", str(m),
            *common, "--log-dir", f"{args.out}/eval"])
        emit({"row": f"samplenet@{m}", "accuracy": r["accuracy"],
              "mean_unique_nn": r["mean_unique_nn"]})

    if not args.skip_progressive:
        train_progressive.main([
            "--epochs", str(args.epochs_prog), "--max-num-out-points", "256",
            *common, "--classifier-ckpt", cls_ckpt,
            "--log-dir", f"{args.out}/progressive"])

    # summary table
    table = {r["row"]: round(r["accuracy"], 4) for r in results}
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(table, f, indent=1)
    print(json.dumps({"summary": table}))


if __name__ == "__main__":
    main()
