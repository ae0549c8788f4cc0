"""CLI: train SampleNet against a frozen classifier
(classification/train_samplenet.py pipeline).

    python -m samplenet_tpu.train.train_samplenet \
        --classifier-ckpt log/classifier/ckpt --num-out-points 32
"""

from __future__ import annotations

import argparse

import jax

from samplenet_tpu.models.pointnet_cls import PointNetClassifier
from samplenet_tpu.train import checkpoints
from samplenet_tpu.train.classification import (
    SampleNetConfig,
    create_samplenet_state,
    make_samplenet_eval_step,
    per_class_accuracy,
    train_samplenet_loop,
)
from samplenet_tpu.train.train_classifier import load_data, parse_args as _cls_args
from samplenet_tpu.utils import Logger


def parse_args(argv=None):
    p = argparse.ArgumentParser("train_samplenet")
    p.add_argument("--dataset", default="procedural",
                   choices=["procedural", "modelnet40"])
    p.add_argument("--data-dir", default="data")
    p.add_argument("--num-points", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--num-out-points", type=int, default=32)
    p.add_argument("--bottleneck-size", type=int, default=128)
    p.add_argument("--group-size", type=int, default=7)
    p.add_argument("--alpha", type=float, default=30.0)
    p.add_argument("--lmbda", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=1.0)
    p.add_argument("--delta", type=float, default=0.0)
    p.add_argument("--learning-rate", type=float, default=0.01)
    p.add_argument("--skip-projection", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute dtype (params stay f32)")
    p.add_argument("--bn-schedule", action="store_true",
                   help="TF-style scheduled BN decay 0.5->0.99")
    p.add_argument("--fused-train", action="store_true", default=None,
                   help="force the --fused-mode fused train kernel "
                        "(default ghost-BN: 2.3x step, per-block BN "
                        "statistics). Unset = auto: the exact-BN fused "
                        "kernel on TPU at loss parity (nn/layers.py)")
    p.add_argument("--no-fused-train", dest="fused_train",
                   action="store_false",
                   help="force the plain XLA train chain")
    p.add_argument("--fused-mode", choices=("ghost", "exact"),
                   default="ghost",
                   help="fused-train variant: ghost (block stats, fastest)"
                        " or exact (global stats, matches the XLA chain)")
    p.add_argument("--fused-f32", action="store_true",
                   help="force f32 in-kernel matmuls in the fused train "
                        "chain (default: mode-dependent)")
    p.add_argument("--conv-layout", default="bnc", choices=["bnc", "bcn"],
                   help="XLA conv-chain activation layout")
    p.add_argument("--classifier-ckpt", default="log/classifier/ckpt")
    p.add_argument("--train-size", type=int, default=2000)
    p.add_argument("--test-size", type=int, default=400)
    p.add_argument("--log-dir", default="log/samplenet")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all local devices")
    p.add_argument("--resume", action="store_true",
                   help="resume from the snap_last snapshot in --log-dir")
    return p.parse_args(argv)


def main(argv=None):
    from samplenet_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup()
    args = parse_args(argv)
    logger = Logger(args.log_dir, "samplenet")
    train, test, num_classes = load_data(args)

    ckpt = checkpoints.restore(args.classifier_ckpt)
    classifier = PointNetClassifier(
        num_classes=int(ckpt["config"]["num_classes"]),
        use_tnets=bool(ckpt["config"]["use_tnets"]),
    )
    classifier_vars = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}

    scfg = SampleNetConfig(
        num_out_points=args.num_out_points,
        bottleneck_size=args.bottleneck_size,
        group_size=args.group_size,
        alpha=args.alpha, lmbda=args.lmbda,
        gamma=args.gamma, delta=args.delta,
        learning_rate=args.learning_rate,
        skip_projection=args.skip_projection,
        batch_size=args.batch_size,
        bn_schedule=args.bn_schedule,
        bf16=args.bf16,
        conv_layout=args.conv_layout,
        fused_train=args.fused_train,
        fused_mode=args.fused_mode,
        fused_bf16=False if args.fused_f32 else None,
    )
    rng = jax.random.PRNGKey(args.seed)
    sampler, state = create_samplenet_state(scfg, args.num_points, rng)

    import os
    start_epoch = 0
    best = {"acc": -1.0}
    snap_last = f"{args.log_dir}/snap_last"
    snap_best = f"{args.log_dir}/snap_best"
    if args.resume and os.path.isdir(snap_last):
        state, extras = checkpoints.restore_train_state(snap_last, state)
        start_epoch = int(extras.get("epoch", -1)) + 1
        best["acc"] = float(extras.get("best_acc", -1.0))
        logger.log(f"resumed from {snap_last} at epoch {start_epoch} "
                   f"(best_acc={best['acc']:.4f})")

    def on_epoch_end(epoch, st, test_acc):
        extras = {"epoch": epoch, "best_acc": max(best["acc"], test_acc)}
        checkpoints.save_train_state(snap_last, st, extras=extras)
        if test_acc > best["acc"]:
            best["acc"] = test_acc
            checkpoints.save_train_state(snap_best, st, extras=extras)

    logger.log(f"training SampleNet {args.num_points}->{args.num_out_points} "
               f"against frozen classifier, device={jax.devices()[0]}")
    state = train_samplenet_loop(
        sampler, state, scfg, classifier, classifier_vars, train, test,
        epochs=args.epochs, logger=logger, rng=rng,
        steps_per_epoch=args.steps_per_epoch,
        start_epoch=start_epoch, epoch_callback=on_epoch_end,
        mesh=(__import__("samplenet_tpu.parallel.mesh", fromlist=["make_mesh"])
              .make_mesh() if args.data_parallel else None),
    )
    # The published checkpoint is the best-eval snapshot, not whatever the
    # last epoch produced — same discipline as train_classifier (a noisy
    # final epoch otherwise costs points and makes sampler-vs-FPS
    # comparisons depend on run length; documented in docs/EVAL_PROTOCOL.md).
    pub_state = state
    if os.path.isdir(snap_best):
        pub_state, extras = checkpoints.restore_train_state(snap_best, state)
        logger.log(f"published checkpoint = best snapshot "
                   f"(eval_acc={best['acc']:.4f}, epoch {extras.get('epoch')})")
    eval_step = make_samplenet_eval_step(sampler, classifier, classifier_vars)
    table = per_class_accuracy(eval_step, pub_state, test,
                               scfg.batch_size, num_classes)
    for ci, acc in enumerate(table):
        logger.log(f"  class {ci}: acc={acc:.4f}")
    ckpt_path = f"{args.log_dir}/ckpt"
    checkpoints.save(ckpt_path, {
        "params": jax.device_get(pub_state.params),
        "batch_stats": jax.device_get(pub_state.batch_stats),
        "config": vars(args),
    })
    logger.log(f"saved checkpoint to {ckpt_path}")
    return state


if __name__ == "__main__":
    main()
