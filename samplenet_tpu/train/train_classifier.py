"""CLI: train the PointNet classifier (the frozen task network for the
classification SampleNet pipeline). Mirrors classification/train_classifier.py
flags where they still make sense.

    python -m samplenet_tpu.train.train_classifier --epochs 10 \
        --dataset procedural --log-dir log/classifier
"""

from __future__ import annotations

import argparse

import jax

from samplenet_tpu.data import make_dataset, load_split
from samplenet_tpu.train import checkpoints
from samplenet_tpu.train.classification import (
    ClassifierConfig,
    create_classifier_state,
    train_classifier_loop,
)
from samplenet_tpu.utils import Logger


def parse_args(argv=None):
    p = argparse.ArgumentParser("train_classifier")
    p.add_argument("--dataset", default="procedural",
                   choices=["procedural", "modelnet40"])
    p.add_argument("--data-dir", default="data")
    p.add_argument("--num-points", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=0.001)
    p.add_argument("--use-tnets", action="store_true")
    p.add_argument("--bn-schedule", action="store_true",
                   help="TF-style scheduled BN decay 0.5->0.99")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute dtype (params stay f32)")
    p.add_argument("--train-size", type=int, default=2000,
                   help="procedural dataset size")
    p.add_argument("--test-size", type=int, default=400)
    p.add_argument("--log-dir", default="log/classifier")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all local devices")
    return p.parse_args(argv)


def load_data(args):
    if args.dataset == "modelnet40":
        train = load_split(args.data_dir, "train")
        test = load_split(args.data_dir, "test")
        num_classes = 40
    else:
        train = make_dataset(args.train_size, args.num_points, seed=args.seed)
        test = make_dataset(args.test_size, args.num_points, seed=args.seed + 1)
        from samplenet_tpu.data import CLASS_NAMES
        num_classes = len(CLASS_NAMES)
    # clouds may carry more points than requested (ModelNet h5 has 2048)
    train = (train[0][:, : args.num_points], train[1])
    test = (test[0][:, : args.num_points], test[1])
    return train, test, num_classes


def main(argv=None):
    from samplenet_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup()
    args = parse_args(argv)
    logger = Logger(args.log_dir, "classifier")
    train, test, num_classes = load_data(args)
    cfg = ClassifierConfig(
        num_classes=num_classes,
        num_points=args.num_points,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        use_tnets=args.use_tnets,
        bn_schedule=args.bn_schedule,
        bf16=args.bf16,
    )
    rng = jax.random.PRNGKey(args.seed)
    model, state = create_classifier_state(cfg, rng)
    logger.log(f"training classifier on {len(train[1])} clouds, "
               f"{num_classes} classes, device={jax.devices()[0]}")
    # track the best test-acc snapshot: the classifier becomes the FROZEN
    # task network, so the best epoch, not the last (which can dip from one
    # noisy BN batch), is what downstream sampler training should see.
    best = {"acc": -1.0, "params": None, "batch_stats": None, "epoch": -1}

    def on_epoch(epoch, st, test_acc):
        if test_acc > best["acc"]:
            best.update(acc=test_acc, epoch=epoch,
                        params=jax.device_get(st.params),
                        batch_stats=jax.device_get(st.batch_stats))

    state = train_classifier_loop(
        model, state, cfg, train, test,
        epochs=args.epochs, logger=logger, rng=rng,
        steps_per_epoch=args.steps_per_epoch,
        mesh=(__import__("samplenet_tpu.parallel.mesh", fromlist=["make_mesh"])
              .make_mesh() if args.data_parallel else None),
        epoch_callback=on_epoch,
    )
    config = {"num_classes": num_classes, "use_tnets": args.use_tnets}
    ckpt_path = f"{args.log_dir}/ckpt"
    checkpoints.save(ckpt_path, {
        "params": best["params"], "batch_stats": best["batch_stats"],
        "config": {**config, "best_epoch": best["epoch"],
                   "best_test_acc": best["acc"]},
    })
    checkpoints.save(f"{args.log_dir}/ckpt_last", {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "config": config,
    })
    logger.log(f"saved best (epoch {best['epoch']}, "
               f"acc {best['acc']:.4f}) to {ckpt_path}; last to ckpt_last")
    return state


if __name__ == "__main__":
    main()
