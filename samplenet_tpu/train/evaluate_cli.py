"""CLI: evaluation + inference dumps.

    python -m samplenet_tpu.train.evaluate_cli classifier --ckpt log/classifier/ckpt
    python -m samplenet_tpu.train.evaluate_cli samplenet --ckpt log/samplenet/ckpt \
        --classifier-ckpt log/classifier/ckpt
    python -m samplenet_tpu.train.evaluate_cli infer --ckpt log/progressive/ckpt \
        --out-dir log/dumps
    python -m samplenet_tpu.train.evaluate_cli from-files \
        --dump log/dumps/sampled/dump.h5 --classifier-ckpt log/classifier/ckpt
"""

from __future__ import annotations

import argparse

import jax

from samplenet_tpu.models.pointnet_cls import PointNetClassifier
from samplenet_tpu.models.samplenet import SampleNet
from samplenet_tpu.train import checkpoints
from samplenet_tpu.train.evaluate import (
    evaluate_classifier_voting,
    evaluate_from_files,
    evaluate_samplenet_matched,
    infer_and_dump,
)
from samplenet_tpu.utils import Logger


def parse_args(argv=None):
    p = argparse.ArgumentParser("evaluate")
    p.add_argument("mode", choices=["classifier", "samplenet", "baseline",
                                    "infer", "from-files"])
    p.add_argument("--sampler", choices=["fps", "random"], default="fps",
                   help="baseline mode: non-learned sampler to evaluate")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--classifier-ckpt", default="log/classifier/ckpt")
    p.add_argument("--dataset", default="procedural",
                   choices=["procedural", "modelnet40"])
    p.add_argument("--data-dir", default="data")
    p.add_argument("--num-points", type=int, default=1024)
    p.add_argument("--num-out-points", type=int, default=32)
    p.add_argument("--bottleneck-size", type=int, default=128)
    p.add_argument("--group-size", type=int, default=7)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--num-votes", type=int, default=12)
    p.add_argument("--matching", choices=["nn", "emd"], default="nn",
                   help="samplenet mode: hard-matching flavour — 'nn' is "
                        "unique-NN + FPS completion; 'emd' takes each "
                        "simplified point's strongest approx-EMD transport "
                        "partner (samplenet_model.py:152-168, with the "
                        "argmax-axis fix noted in ops.matching.emd_matching)")
    p.add_argument("--test-size", type=int, default=400)
    p.add_argument("--train-size", type=int, default=16)  # unused, for load_data
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[8, 16, 32, 64, 128, 256])
    p.add_argument("--dump", default=None)
    p.add_argument("--out-dir", default="log/dumps")
    p.add_argument("--log-dir", default="log/eval")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def _load_classifier(path):
    ckpt = checkpoints.restore(path)
    classifier = PointNetClassifier(
        num_classes=int(ckpt["config"]["num_classes"]),
        use_tnets=bool(ckpt["config"]["use_tnets"]))
    return classifier, {"params": ckpt["params"],
                        "batch_stats": ckpt["batch_stats"]}


def main(argv=None):
    from samplenet_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup()
    args = parse_args(argv)
    logger = Logger(args.log_dir, f"eval_{args.mode}")
    from samplenet_tpu.train.train_classifier import load_data
    _, test, num_classes = load_data(args)

    if args.mode == "classifier":
        classifier, c_vars = _load_classifier(args.ckpt or args.classifier_ckpt)
        report = evaluate_classifier_voting(
            classifier, c_vars, test[0], test[1], args.batch_size,
            args.num_votes)
        logger.log(f"voting accuracy ({args.num_votes} votes): "
                   f"{report['accuracy']:.4f}")
        for ci, acc in enumerate(report["per_class_accuracy"]):
            logger.log(f"  class {ci}: {acc:.4f}")
        return report

    if args.mode == "baseline":
        from samplenet_tpu.train.evaluate import evaluate_baseline_sampler

        classifier, c_vars = _load_classifier(args.classifier_ckpt)
        report = evaluate_baseline_sampler(
            classifier, c_vars, test[0], test[1], args.batch_size,
            args.num_out_points, sampler=args.sampler, seed=args.seed)
        logger.log(f"{args.sampler} baseline accuracy@{args.num_out_points}: "
                   f"{report['accuracy']:.4f}")
        return report

    if args.mode == "samplenet":
        classifier, c_vars = _load_classifier(args.classifier_ckpt)
        ckpt = checkpoints.restore(args.ckpt)
        sampler = SampleNet(
            num_out_points=args.num_out_points,
            bottleneck_size=args.bottleneck_size,
            group_size=args.group_size, sigma_mode="tf")
        s_vars = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
        report = evaluate_samplenet_matched(
            sampler, s_vars, classifier, c_vars,
            test[0], test[1], args.batch_size, matching=args.matching)
        logger.log(f"matched accuracy@{args.num_out_points} "
                   f"({args.matching} matching): {report['accuracy']:.4f} "
                   f"(mean unique NN {report['mean_unique_nn']:.1f})")
        for ci, acc in enumerate(report["per_class_accuracy"]):
            logger.log(f"  class {ci}: {acc:.4f}")
        return report

    if args.mode == "infer":
        ckpt = checkpoints.restore(args.ckpt)
        max_out = int(ckpt["config"].get("max_num_out_points",
                                         args.num_out_points))
        sampler = SampleNet(
            num_out_points=max_out,
            bottleneck_size=args.bottleneck_size,
            group_size=args.group_size, sigma_mode="tf")
        from samplenet_tpu.train.state import TrainState
        import optax

        state = TrainState.create(
            params=ckpt["params"], batch_stats=ckpt["batch_stats"],
            tx=optax.identity())
        paths = infer_and_dump(sampler, state, test[0], test[1],
                               args.out_dir, num_out_points=max_out,
                               batch_size=args.batch_size)
        for key, path in paths.items():
            logger.log(f"dumped {key} -> {path}")
        return paths

    # from-files
    classifier, c_vars = _load_classifier(args.classifier_ckpt)
    accs = evaluate_from_files(classifier, c_vars, args.dump, args.sizes,
                               args.batch_size)
    for size, acc in accs.items():
        logger.log(f"prefix {size}: accuracy={acc:.4f}")
    return accs


if __name__ == "__main__":
    main()
