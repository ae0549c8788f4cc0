"""CLI: SampleNetProgressive training + prefix evaluation (classification).

    python -m samplenet_tpu.train.train_progressive \
        --classifier-ckpt log/classifier/ckpt --max-num-out-points 256
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from samplenet_tpu.data import iterate_batches
from samplenet_tpu.models.pointnet_cls import PointNetClassifier
from samplenet_tpu.train import checkpoints
from samplenet_tpu.train.progressive import (
    ProgressiveConfig,
    create_progressive_state,
    evaluate_prefixes,
    make_progressive_infer_step,
    make_progressive_train_step,
)
from samplenet_tpu.train.train_classifier import load_data
from samplenet_tpu.utils import Logger


def parse_args(argv=None):
    p = argparse.ArgumentParser("train_progressive")
    p.add_argument("--dataset", default="procedural",
                   choices=["procedural", "modelnet40"])
    p.add_argument("--data-dir", default="data")
    p.add_argument("--num-points", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--max-num-out-points", type=int, default=256)
    p.add_argument("--min-num-out-points", type=int, default=8)
    p.add_argument("--bottleneck-size", type=int, default=128)
    p.add_argument("--group-size", type=int, default=7)
    p.add_argument("--alpha", type=float, default=30.0)
    p.add_argument("--lmbda", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=0.5)
    p.add_argument("--delta", type=float, default=1.0 / 30.0)
    p.add_argument("--classifier-ckpt", default="log/classifier/ckpt")
    p.add_argument("--train-size", type=int, default=2000)
    p.add_argument("--test-size", type=int, default=400)
    p.add_argument("--eval-every", type=int, default=0,
                   help="run the prefix eval + save a checkpoint every K "
                        "epochs (0 = only at the end); long runs stay "
                        "harvestable if interrupted")
    p.add_argument("--fused-train", action="store_true", default=None,
                   help="force the --fused-mode fused train kernel for the "
                        "sampler's simplification chain (unset = auto "
                        "exact-BN fused on TPU; nn/layers.py)")
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
    p.add_argument("--log-dir", default="log/progressive")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    from samplenet_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup()
    args = parse_args(argv)
    logger = Logger(args.log_dir, "progressive")
    train, test, num_classes = load_data(args)

    ckpt = checkpoints.restore(args.classifier_ckpt)
    classifier = PointNetClassifier(
        num_classes=int(ckpt["config"]["num_classes"]),
        use_tnets=bool(ckpt["config"]["use_tnets"]))
    c_vars = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}

    cfg = ProgressiveConfig(
        max_num_out_points=args.max_num_out_points,
        min_num_out_points=args.min_num_out_points,
        bottleneck_size=args.bottleneck_size,
        group_size=args.group_size,
        alpha=args.alpha, lmbda=args.lmbda,
        gamma=args.gamma, delta=args.delta,
        batch_size=args.batch_size,
        fused_train=args.fused_train,
        fused_mode=args.fused_mode,
        fused_bf16=False if args.fused_f32 else None,
    )
    rng = jax.random.PRNGKey(args.seed)
    sampler, state = create_progressive_state(cfg, args.num_points, rng)
    step = make_progressive_train_step(sampler, classifier, c_vars, cfg)
    logger.log(f"progressive sizes {cfg.sizes}, device={jax.devices()[0]}")

    infer = make_progressive_infer_step(sampler, cfg.max_num_out_points)

    def eval_and_save(tag: str):
        accs = evaluate_prefixes(infer, state, classifier, c_vars,
                                 test[0], test[1], cfg.sizes, args.batch_size)
        for s in cfg.sizes:
            logger.log(f"{tag} prefix {s}: eval acc={accs[s]:.4f}")
        logger.metrics(int(state.step),
                       **{f"eval_acc@{s}": float(accs[s]) for s in cfg.sizes})
        checkpoints.save(f"{args.log_dir}/ckpt", {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "config": vars(args),
        })
        logger.log(f"saved checkpoint to {args.log_dir}/ckpt")
        return accs

    np_rng = np.random.RandomState(0)
    for epoch in range(args.epochs):
        agg: dict[str, list] = {}
        for bi, (bx, by) in enumerate(iterate_batches(
                train[0], train[1], args.batch_size, rng=np_rng)):
            if args.steps_per_epoch and bi >= args.steps_per_epoch:
                break
            state, metrics = step(state, jnp.asarray(bx), jnp.asarray(by))
            for k, v in metrics.items():
                agg.setdefault(k, []).append(v)  # async device scalars
        mean = {k: float(np.mean(jax.device_get(v))) for k, v in agg.items()}
        logger.log(f"epoch {epoch}: " +
                   " ".join(f"{k}={v:.4f}" for k, v in sorted(mean.items())))
        logger.metrics(int(state.step), **mean)
        if args.eval_every and (epoch + 1) % args.eval_every == 0 \
                and epoch + 1 < args.epochs:
            eval_and_save(f"epoch {epoch}:")

    eval_and_save("final")
    return state


if __name__ == "__main__":
    main()
