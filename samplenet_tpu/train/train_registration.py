"""CLI: registration track — phase 1 trains PCRNet, phase 2 trains SampleNet
against the frozen PCRNet (registration/main.py pipeline).

    python -m samplenet_tpu.train.train_registration --phase pcrnet
    python -m samplenet_tpu.train.train_registration --phase samplenet \
        --pcrnet-ckpt log/pcrnet/ckpt
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from samplenet_tpu.data.procedural import make_dataset
from samplenet_tpu.data.qdataset import QuaternionFixedDataset
from samplenet_tpu.train import checkpoints
from samplenet_tpu.train.registration import (
    RegistrationConfig,
    create_pcrnet_state,
    create_sampler_state,
    evaluate,
    make_eval_step,
    make_pcrnet_train_step,
    make_sampler_train_step,
)
from samplenet_tpu.utils import Logger


def parse_args(argv=None):
    p = argparse.ArgumentParser("train_registration")
    p.add_argument("--phase", choices=["pcrnet", "samplenet"], default="pcrnet")
    p.add_argument("--num-points", type=int, default=1024)
    p.add_argument("--num-out-points", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--train-size", type=int, default=256)
    p.add_argument("--test-size", type=int, default=64)
    p.add_argument("--repeat", type=int, default=2)
    p.add_argument("--alpha", type=float, default=0.01)
    p.add_argument("--lmbda", type=float, default=0.01)
    p.add_argument("--group-size", type=int, default=8)
    p.add_argument("--num-sampled-clouds", type=int, default=2, choices=[1, 2])
    p.add_argument("--apply-noise", action="store_true")
    p.add_argument("--iterations", type=int, default=1,
                   help="iterative registration refinement passes at eval "
                        "(the original PCRNet protocol; reference uses 1)")
    p.add_argument("--train-iterations", type=int, default=1,
                   help="composed refinement passes inside the train loss "
                        "(iteration-matched training; validation/selection "
                        "uses the same count)")
    p.add_argument("--category", type=int, default=None,
                   help="restrict to one procedural class (the reference "
                        "trains registration on the ModelNet 'car' subset)")
    p.add_argument("--h5-dir", default=None,
                   help="directory holding <name>_train.h5/<name>_test.h5 "
                        "single-class shards as written by scripts/"
                        "make_car_dataset.py (registration/data/"
                        "create_dataset_torch.py output) — overrides the "
                        "procedural dataset; --train-size/--test-size/"
                        "--category are ignored")
    p.add_argument("--fused-train", action="store_true", default=None,
                   help="force the --fused-mode fused train kernel for the "
                        "sampler's simplification chain (samplenet phase "
                        "only; unset = auto exact-BN fused on TPU)")
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
    p.add_argument("--pcrnet-ckpt", default="log/pcrnet/ckpt")
    p.add_argument("--log-dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fps-eval-sizes", default="",
                   help="comma list of m values; phase pcrnet reports the "
                        "FPS baseline at each (multi-m quality tables)")
    return p.parse_args(argv)


def build_datasets(args):
    """Procedural clouds under fixed random rotations (the car-subset h5 of
    the reference, registration/data/create_dataset_torch.py, is download-
    gated; any [M, N, 3] array feeds QuaternionFixedDataset). --h5-dir
    instead loads a single-class h5 pair (make_car_dataset.py output)."""
    if args.h5_dir is not None:
        import glob as _glob

        from samplenet_tpu.data.modelnet import load_h5

        def one(split):
            paths = sorted(_glob.glob(
                os.path.join(args.h5_dir, f"*_{split}.h5")))
            if not paths:
                raise FileNotFoundError(
                    f"no *_{split}.h5 under {args.h5_dir}")
            data = np.concatenate([load_h5(p)[0] for p in paths])
            return data[:, : args.num_points, :]

        base_train, base_test = one("train"), one("test")
    elif args.category is not None:
        # over-generate then filter to one shape class (car-subset analogue)
        d, l = make_dataset(args.train_size * 12, args.num_points,
                            seed=args.seed)
        base_train = d[l == args.category][: args.train_size]
        d, l = make_dataset(args.test_size * 12, args.num_points,
                            seed=args.seed + 1)
        base_test = d[l == args.category][: args.test_size]
    else:
        base_train, _ = make_dataset(args.train_size, args.num_points,
                                     seed=args.seed)
        base_test, _ = make_dataset(args.test_size, args.num_points,
                                    seed=args.seed + 1)
    train = QuaternionFixedDataset(base_train, repeat=args.repeat, seed=0,
                                   apply_noise=args.apply_noise)
    test = QuaternionFixedDataset(base_test, repeat=1, seed=1,
                                  apply_noise=args.apply_noise,
                                  fixed_noise=args.apply_noise)
    return train, test


def main(argv=None):
    from samplenet_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup()
    args = parse_args(argv)
    log_dir = args.log_dir or f"log/registration_{args.phase}"
    logger = Logger(log_dir, args.phase)
    train, test = build_datasets(args)

    cfg = RegistrationConfig(
        num_points=args.num_points,
        num_out_points=args.num_out_points,
        group_size=args.group_size,
        alpha=args.alpha, lmbda=args.lmbda,
        num_sampled_clouds=args.num_sampled_clouds,
        batch_size=args.batch_size,
        train_iterations=args.train_iterations,
        fused_train=args.fused_train,
        fused_mode=args.fused_mode,
        fused_bf16=False if args.fused_f32 else None,
    )
    rng = jax.random.PRNGKey(args.seed)
    np_rng = np.random.RandomState(0)

    if args.phase == "pcrnet":
        from samplenet_tpu.geometry.transforms import (
            QuaternionTransform, rad_to_deg)
        from samplenet_tpu.train.registration import (
            register_iterative, sampling_consistency)

        model, state = create_pcrnet_state(cfg, rng)
        step = make_pcrnet_train_step(model, cfg)

        # one jitted validation step with the params as an ARGUMENT, so
        # per-epoch validation never re-traces; signature matches
        # evaluate()'s eval_step contract with pcr params in the vars slot.
        # Validation/selection uses the TRAINED pass count: a model trained
        # at k passes must be selected at k passes (any mismatch is a broken
        # signal — a single-pass-trained PCRNet collapses under composed
        # passes, and vice versa). --iterations only affects the final
        # test report.
        @jax.jit
        def val_step(pcr_params, p0, p1, tw):
            est = register_iterative(model, {"params": pcr_params},
                                     p0, p1, args.train_iterations)
            rot = rad_to_deg(est.rotation_errors(QuaternionTransform(tw)))
            return rot, jnp.zeros(()), sampling_consistency(p0, p1, tw)

        # track the best validation snapshot — PCRNet becomes the frozen
        # task network, so a noisy final epoch must not be what downstream
        # sampler training freezes (same discipline as train_classifier).
        best = {"rot": float("inf"), "params": None, "epoch": -1}
        for epoch in range(args.epochs):
            agg = []
            for bi, (p0, p1, tw) in enumerate(train.batches(
                    args.batch_size, rng=np_rng)):
                if args.steps_per_epoch and bi >= args.steps_per_epoch:
                    break
                state, info = step(state, jnp.asarray(p0), jnp.asarray(p1),
                                   jnp.asarray(tw))
                agg.append(info)  # device scalars; no per-step host sync
            agg = jax.device_get(agg)
            mean = {k: float(np.mean([a[k] for a in agg])) for k in agg[0]}
            val = evaluate(val_step, state.params, test, args.batch_size)
            logger.log(f"epoch {epoch}: " +
                       " ".join(f"{k}={v:.4f}" for k, v in mean.items()) +
                       f" val_rot={val['rot_err_mean']:.2f}deg")
            logger.metrics(int(state.step), val_rot=val["rot_err_mean"],
                           **mean)
            if val["rot_err_mean"] < best["rot"]:
                best.update(rot=val["rot_err_mean"], epoch=epoch,
                            params=jax.device_get(state.params))
        if best["params"] is None:
            # --epochs 0 or every epoch's val metric was NaN (NaN < inf is
            # False): fall back to the final state so checkpointing and the
            # test report still run
            best.update(params=jax.device_get(state.params), epoch=-1)
        pcr_vars = {"params": best["params"]}
        logger.log(f"best epoch {best['epoch']}: "
                   f"val_rot={best['rot']:.2f}deg")
        # non-learned FPS baseline sampling (registration/main.py:485-499),
        # at the config m plus any --fps-eval-sizes (multi-m tables)
        from samplenet_tpu.models.samplenet import FPSSampler

        fps_sizes = sorted({cfg.num_out_points} | {
            int(s) for s in args.fps_eval_sizes.split(",") if s.strip()})
        reports: dict[str, dict] = {"best_val_rot": best["rot"],
                                    "best_epoch": best["epoch"]}
        for its in sorted({1, args.iterations}):
            eval_step = make_eval_step(None, model, pcr_vars, cfg,
                                       iterations=its)
            report = evaluate(eval_step, None, test, args.batch_size)
            logger.log(f"test (full clouds, iterations={its}): {report}")
            reports[f"full_iter{its}"] = report
            for m in fps_sizes:
                fps = FPSSampler(num_out_points=m, permute=False)
                fps_vars = fps.init(jax.random.PRNGKey(0),
                                    jnp.zeros((2, cfg.num_points, 3)))
                fps_eval = make_eval_step(fps, model, pcr_vars, cfg,
                                          iterations=its)
                report_fps = evaluate(fps_eval, fps_vars, test,
                                      args.batch_size)
                logger.log(f"test (FPS-sampled {m}, "
                           f"iterations={its}): {report_fps}")
                reports[f"fps{m}_iter{its}"] = report_fps
        checkpoints.save(f"{log_dir}/ckpt", {"params": pcr_vars["params"]})
        logger.log(f"saved checkpoint to {log_dir}/ckpt")
        import json as _json
        with open(f"{log_dir}/report.json", "w") as f:
            _json.dump(reports, f, indent=1)
        return state

    # phase == samplenet
    pcr_params = checkpoints.restore(args.pcrnet_ckpt)["params"]
    pcrnet_model, _ = create_pcrnet_state(cfg, jax.random.PRNGKey(99))
    pcr_vars = {"params": pcr_params}
    sampler, state = create_sampler_state(cfg, rng)
    step = make_sampler_train_step(sampler, pcrnet_model, pcr_vars, cfg)
    # per-epoch validation/selection at the trained pass count (see the
    # phase-1 val_step note); --iterations only affects the final report
    eval_step = make_eval_step(sampler, pcrnet_model, pcr_vars, cfg,
                               iterations=args.train_iterations)
    # publish the best-validation snapshot, not the last epoch
    # (docs/EVAL_PROTOCOL.md checkpoint-selection policy)
    best = {"rot": float("inf"), "vars": None, "epoch": -1, "report": None}
    for epoch in range(args.epochs):
        agg = []
        for bi, (p0, p1, tw) in enumerate(train.batches(
                args.batch_size, rng=np_rng)):
            if args.steps_per_epoch and bi >= args.steps_per_epoch:
                break
            state, info = step(state, jnp.asarray(p0), jnp.asarray(p1),
                               jnp.asarray(tw))
            agg.append(info)  # device scalars; no per-step host sync
        agg = jax.device_get(agg)
        mean = {k: float(np.mean([a[k] for a in agg])) for k in agg[0]}
        logger.log(f"epoch {epoch}: " +
                   " ".join(f"{k}={v:.4f}" for k, v in mean.items()))
        logger.metrics(int(state.step), **mean)
        sampler_vars = {"params": state.params, "batch_stats": state.batch_stats}
        report = evaluate(eval_step, sampler_vars, test, args.batch_size)
        logger.log(f"  eval: rot_err={report['rot_err_mean']:.2f}deg "
                   f"auc={report['auc']:.4f} "
                   f"consistency={report['consistency_mean']:.5f}")
        if report["rot_err_mean"] < best["rot"]:
            best.update(rot=report["rot_err_mean"], epoch=epoch,
                        report=report,
                        vars=jax.device_get(sampler_vars))
    if best["vars"] is None:
        # --epochs 0 / all-NaN validation: fall back to the final state
        sampler_vars = {"params": state.params,
                        "batch_stats": state.batch_stats}
        best.update(vars=jax.device_get(sampler_vars), epoch=-1,
                    report=evaluate(eval_step, sampler_vars, test,
                                    args.batch_size))
    logger.log(f"best epoch {best['epoch']}: {best['report']}")
    reports = {"best": best["report"], "best_epoch": best["epoch"]}
    if args.iterations != 1:
        it_eval = make_eval_step(sampler, pcrnet_model, pcr_vars, cfg,
                                 iterations=args.iterations)
        report = evaluate(it_eval, best["vars"], test, args.batch_size)
        logger.log(f"best snapshot at iterations={args.iterations}: {report}")
        reports[f"best_iter{args.iterations}"] = report
    checkpoints.save(f"{log_dir}/ckpt", {
        "params": best["vars"]["params"],
        "batch_stats": best["vars"]["batch_stats"],
    })
    logger.log(f"saved checkpoint to {log_dir}/ckpt")
    import json as _json
    with open(f"{log_dir}/report.json", "w") as f:
        _json.dump(reports, f, indent=1)
    return state


if __name__ == "__main__":
    main()
