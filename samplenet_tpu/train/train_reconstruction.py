"""CLI: reconstruction track — phase 1 trains the AE, phase 2 trains the
SampleNet sampler against the frozen AE and reports NRE
(reconstruction/autoencoder/train_ae.py + sampler/train_samplenet.py).

    python -m samplenet_tpu.train.train_reconstruction --phase ae
    python -m samplenet_tpu.train.train_reconstruction --phase samplenet \
        --ae-ckpt log/ae/ckpt --num-out-points 64
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from samplenet_tpu.data import augment, iterate_batches, make_dataset
from samplenet_tpu.train import checkpoints
from samplenet_tpu.train.reconstruction import (
    AEConfig,
    SampleNetAEConfig,
    create_ae_state,
    create_sampler_ae_state,
    evaluate_nre,
    make_ae_eval_step,
    make_ae_train_step,
    make_sampler_ae_eval_step,
    make_sampler_ae_train_step,
)
from samplenet_tpu.utils import Logger


def parse_args(argv=None):
    p = argparse.ArgumentParser("train_reconstruction")
    p.add_argument("--phase", choices=["ae", "samplenet"], default="ae")
    p.add_argument("--dataset", default="procedural",
                   choices=["procedural", "shapenet"],
                   help="shapenet: per-category ShapeNetCore PLYs under "
                        "--data-dir (reconstruction/src/in_out.py flow; "
                        "85/5/10 split, train on the train split, NRE on "
                        "the test split); --train-size/--test-size are "
                        "ignored")
    p.add_argument("--data-dir", default="data",
                   help="root containing shape_net_core_uniform_samples_"
                        "2048/ (shapenet dataset only)")
    p.add_argument("--category", default="chair",
                   help="ShapeNet category or synset id (shapenet only)")
    p.add_argument("--num-points", type=int, default=2048)
    p.add_argument("--batch-size", type=int, default=50)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--train-size", type=int, default=500)
    p.add_argument("--test-size", type=int, default=100)
    p.add_argument("--loss", choices=["chamfer", "emd", "softassign"],
                   default="chamfer",
                   help="AE loss: reference menu (chamfer/emd) plus "
                        "softassign, a TPU-native adaptive soft-assignment "
                        "matching loss (beyond-reference; PAPERS.md)")
    p.add_argument("--emd-fast", action="store_true",
                   help="run the approx-EMD match levels in bf16 with f32 "
                        "reductions (ops.matching fast_math: 2.15x at "
                        "2048^2, <0.2%% transport-cost error); XLA path "
                        "only — the fused Pallas kernel has no HBM level "
                        "traffic to halve")
    p.add_argument("--no-emd-kernel", action="store_true",
                   help="pin the XLA scan for the emd loss instead of the "
                        "fused Pallas kernel (kernel-vs-XLA quality A/Bs)")
    p.add_argument("--bottleneck-size", type=int, default=128)
    p.add_argument("--num-out-points", type=int, default=64)
    p.add_argument("--group-size", type=int, default=16)
    p.add_argument("--alpha", type=float, default=0.01)
    p.add_argument("--lmbda", type=float, default=0.0001)
    p.add_argument("--ae-ckpt", default="log/ae/ckpt")
    p.add_argument("--denoising-sigma", type=float, default=0.0,
                   help="gaussian input-corruption sigma; >0 trains "
                        "noisy->clean (the reference's split x/gt "
                        "placeholders, autoencoder.py:121-129) and, in the "
                        "samplenet phase, doubles the size-scaled "
                        "simplification weight (2w, is_denoising)")
    p.add_argument("--outlier-ratio", type=float, default=0.0,
                   help="fraction of point slots replaced with uniform "
                        "[-1,1] outliers on the model INPUT (clean target "
                        "stays the score) — heavy-corruption robustness "
                        "protocol")
    p.add_argument("--fps-baseline", action="store_true",
                   help="samplenet phase: also report the FPS-baseline NRE "
                        "at --num-out-points through the frozen AE (the "
                        "paper's comparison point for SampleNet NRE)")
    p.add_argument("--progressive", action="store_true",
                   help="nested-size sampler training: one checkpoint "
                        "serves every ratio (samplenet_progressive_"
                        "pointnet_ae pipeline)")
    p.add_argument("--min-num-out-points", type=int, default=16)
    p.add_argument("--fused-train", action="store_true", default=None,
                   help="force the --fused-mode fused train kernel for the "
                        "train-mode point-MLP chain (ae phase: encoder; "
                        "samplenet phase: simplification net). Unset = "
                        "auto exact-BN fused on TPU")
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
    p.add_argument("--log-dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--init-ckpt", default=None,
                   help="restore params/batch_stats before training; with "
                        "--epochs 0 this is a standalone evaluation of an "
                        "existing checkpoint (the reference's "
                        "autoencoder/evaluate_ae.py and sampler/"
                        "evaluate_samplenet[_progressive].py workflows)")
    return p.parse_args(argv)


def main(argv=None):
    from samplenet_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup()
    args = parse_args(argv)
    log_dir = args.log_dir or f"log/reconstruction_{args.phase}"
    logger = Logger(log_dir, args.phase)
    if args.dataset == "shapenet":
        from samplenet_tpu.data.shapenet import load_category_split

        train_data, _val, test_data = load_category_split(
            args.data_dir, args.category, args.num_points, seed=args.seed)
        logger.log(f"shapenet {args.category}: {len(train_data)} train / "
                   f"{len(_val)} val / {len(test_data)} test clouds")
    else:
        train_data, _ = make_dataset(args.train_size, args.num_points,
                                     seed=args.seed)
        test_data, _ = make_dataset(args.test_size, args.num_points,
                                    seed=args.seed + 1)
    rng = jax.random.PRNGKey(args.seed)
    np_rng = np.random.RandomState(0)
    dummy_labels = np.zeros(len(train_data), np.int32)

    sigma = args.denoising_sigma
    outlier = args.outlier_ratio
    corrupting = sigma > 0 or outlier > 0

    def make_corrupt(rng_):
        def corrupt(bx):
            if sigma > 0:
                bx = augment.jitter_point_cloud(bx, rng_, sigma=sigma,
                                                clip=1.0)
            if outlier > 0:
                bx = augment.noisy_point_cloud(bx, rng_, ratio=outlier)
            return bx
        return corrupt

    corrupt = make_corrupt(np_rng)

    if args.phase == "ae":
        cfg = AEConfig(num_points=args.num_points, loss=args.loss,
                       emd_fast=args.emd_fast,
                       emd_kernel=False if args.no_emd_kernel else None,
                       batch_size=args.batch_size,
                       bottleneck_size=args.bottleneck_size,
                       n_sample_points=args.num_points,
                       denoising_sigma=sigma,
                       fused_train=args.fused_train,
                       fused_mode=args.fused_mode,
                       fused_bf16=False if args.fused_f32 else None)
        model, state = create_ae_state(cfg, rng)
        if args.init_ckpt:
            init = checkpoints.restore(args.init_ckpt)
            state = state.replace(params=init["params"],
                                  batch_stats=init["batch_stats"])
            logger.log(f"restored {args.init_ckpt}")
        step = make_ae_train_step(model, cfg)
        eval_step = make_ae_eval_step(model)
        if args.epochs == 0:  # standalone eval of --init-ckpt
            test_losses = [
                float(np.mean(np.asarray(eval_step(state, jnp.asarray(bx)))))
                for bx, _ in iterate_batches(
                    test_data, np.zeros(len(test_data), np.int32),
                    args.batch_size, shuffle=False)
            ]
            logger.log(f"eval-only: test={np.mean(test_losses):.5f}")
            logger.metrics(0, test=np.mean(test_losses))
        for epoch in range(args.epochs):
            losses = []
            for bi, (bx, _) in enumerate(iterate_batches(
                    train_data, dummy_labels, args.batch_size, rng=np_rng)):
                if args.steps_per_epoch and bi >= args.steps_per_epoch:
                    break
                if corrupting:
                    state, loss = step(state, jnp.asarray(corrupt(bx)),
                                       jnp.asarray(bx))
                else:
                    state, loss = step(state, jnp.asarray(bx))
                losses.append(loss)  # async device scalar
            test_losses = [
                float(np.mean(np.asarray(eval_step(state, jnp.asarray(bx)))))
                for bx, _ in iterate_batches(
                    test_data, np.zeros(len(test_data), np.int32),
                    args.batch_size, shuffle=False)
            ]
            logger.log(f"epoch {epoch}: train={np.mean(losses):.5f} "
                       f"test={np.mean(test_losses):.5f}")
            logger.metrics(int(state.step), train=np.mean(losses),
                           test=np.mean(test_losses))
        checkpoints.save(f"{log_dir}/ckpt", {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "config": {"num_points": args.num_points,
                       "bottleneck_size": args.bottleneck_size,
                       "loss": args.loss,
                       "denoising_sigma": sigma,
                       "outlier_ratio": outlier},
        })
        logger.log(f"saved checkpoint to {log_dir}/ckpt")
        return state

    # phase == samplenet
    ae_ckpt = checkpoints.restore(args.ae_ckpt)
    from samplenet_tpu.models.autoencoder import PointNetAE

    ae = PointNetAE(num_output_points=int(ae_ckpt["config"]["num_points"]),
                    bottleneck_size=int(ae_ckpt["config"]["bottleneck_size"]))
    ae_vars = {"params": ae_ckpt["params"], "batch_stats": ae_ckpt["batch_stats"]}
    scfg = SampleNetAEConfig(
        num_out_points=args.num_out_points,
        group_size=args.group_size,
        alpha=args.alpha, lmbda=args.lmbda,
        batch_size=args.batch_size,
        is_denoising=corrupting,
        emd_fast=args.emd_fast,
        emd_kernel=False if args.no_emd_kernel else None,
        fused_train=args.fused_train,
        fused_mode=args.fused_mode,
        fused_bf16=False if args.fused_f32 else None,
    )
    if args.progressive:
        from samplenet_tpu.train.progressive import (
            ProgressiveAEConfig,
            make_progressive_ae_train_step,
        )

        pcfg = ProgressiveAEConfig(
            max_num_out_points=args.num_out_points,
            min_num_out_points=args.min_num_out_points,
            group_size=args.group_size,
            alpha=args.alpha, lmbda=args.lmbda,
            batch_size=args.batch_size,
        )
        sampler, state = create_sampler_ae_state(scfg, args.num_points, rng)
        step = make_progressive_ae_train_step(sampler, ae, ae_vars, pcfg)
        logger.log(f"progressive AE sizes {pcfg.sizes}")
    else:
        sampler, state = create_sampler_ae_state(scfg, args.num_points, rng)
        step = make_sampler_ae_train_step(
            sampler, ae, ae_vars, scfg, ae_loss=str(ae_ckpt["config"]["loss"]))
    if args.init_ckpt:
        init = checkpoints.restore(args.init_ckpt)
        state = state.replace(params=init["params"],
                              batch_stats=init["batch_stats"])
        logger.log(f"restored {args.init_ckpt}")
    eval_step = make_sampler_ae_eval_step(sampler, ae, ae_vars)

    def report_fps_baseline():
        if not args.fps_baseline:
            return
        from samplenet_tpu.train.reconstruction import make_fps_ae_eval_step

        fps_step = make_fps_ae_eval_step(ae, ae_vars, args.num_out_points)
        eval_rng = np.random.RandomState(123)
        rep = evaluate_nre(
            fps_step, state, test_data, args.batch_size,
            noise_fn=make_corrupt(eval_rng) if corrupting else None)
        logger.log(f"FPS baseline @{args.num_out_points}: "
                   f"NRE={rep['nre']:.4f} "
                   f"(cd={rep['loss_sampled_mean']:.5f} vs "
                   f"full={rep['loss_full_mean']:.5f})")
        logger.metrics(int(state.step), fps_nre=rep["nre"])

    if args.epochs == 0:  # standalone NRE eval of --init-ckpt
        eval_rng = np.random.RandomState(123)
        report = evaluate_nre(
            eval_step, state, test_data, args.batch_size,
            noise_fn=make_corrupt(eval_rng) if corrupting else None)
        logger.log(f"eval-only: NRE={report['nre']:.4f}")
        logger.metrics(0, nre=report["nre"])
        report_fps_baseline()
    for epoch in range(args.epochs):
        agg: dict[str, list] = {}
        for bi, (bx, _) in enumerate(iterate_batches(
                train_data, dummy_labels, args.batch_size, rng=np_rng)):
            if args.steps_per_epoch and bi >= args.steps_per_epoch:
                break
            if corrupting:
                state, metrics = step(state, jnp.asarray(corrupt(bx)),
                                      jnp.asarray(bx))
            else:
                state, metrics = step(state, jnp.asarray(bx))
            for k, v in metrics.items():
                agg.setdefault(k, []).append(v)  # async device scalar
        mean = {k: float(np.mean(v)) for k, v in agg.items()}
        eval_rng = np.random.RandomState(123)
        report = evaluate_nre(
            eval_step, state, test_data, args.batch_size,
            noise_fn=make_corrupt(eval_rng) if corrupting else None)
        logger.log(f"epoch {epoch}: " +
                   " ".join(f"{k}={v:.5f}" for k, v in mean.items()) +
                   f" | NRE={report['nre']:.4f}")
        logger.metrics(int(state.step), nre=report["nre"], **mean)
    if args.epochs:
        report_fps_baseline()
    if args.progressive:
        # prefix-NRE curve from the single ordered checkpoint — the
        # progressive track's quality evidence (reconstruction/sampler/
        # evaluate_samplenet_progressive.py:92-153)
        import json

        from samplenet_tpu.train.progressive import evaluate_ae_prefix_nre

        curve = evaluate_ae_prefix_nre(
            sampler, state, ae, ae_vars, test_data, pcfg.sizes,
            args.batch_size)
        for s in pcfg.sizes:
            logger.log(f"prefix {s}: NRE={curve[s]['nre']:.4f} "
                       f"(cd={curve[s]['loss_sampled']:.5f} vs "
                       f"full={curve[s]['loss_full']:.5f})")
        with open(f"{log_dir}/prefix_nre.json", "w") as f:
            json.dump({str(s): curve[s] for s in pcfg.sizes}, f, indent=1)
    checkpoints.save(f"{log_dir}/ckpt", {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    })
    logger.log(f"saved checkpoint to {log_dir}/ckpt")
    return state


if __name__ == "__main__":
    main()
