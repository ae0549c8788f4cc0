"""Registration track: PCRNet training + SampleNet-vs-frozen-PCRNet.

TPU re-architecture of registration/main.py's `Action` class (train_1/eval_1/
test_1): the whole step — dual-cloud sampling, PCRNet forward, chamfer +
transform-error losses, optimiser — is one jitted program. Evaluation
reproduces the reference protocol: rotation error (PCN formula, degrees),
AUC of the precision curve over 0-180 deg in 0.5-deg bins (main.py:461-479),
and the dual-cloud sampling-consistency chamfer (main.py:540-555).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from samplenet_tpu.geometry.quaternion import qmul, qrot
from samplenet_tpu.geometry.transforms import QuaternionTransform, rad_to_deg
from samplenet_tpu.models.pcrnet import PCRNet
from samplenet_tpu.models.samplenet import SampleNet
from samplenet_tpu.ops.chamfer import chamfer_distance
from samplenet_tpu.train.state import TrainState, adam_with_schedule, staircase_lr


@dataclass
class RegistrationConfig:
    num_points: int = 1024
    num_out_points: int = 64
    bottleneck_size: int = 128
    group_size: int = 8
    # sputils.get_parser defaults (registration/src/sputils.py:45-61)
    alpha: float = 0.01
    lmbda: float = 0.01
    gamma: float = 1.0
    delta: float = 0.0
    loss_type: int = 0          # 0: norm_err + chamfer; 1: chamfer only
    num_sampled_clouds: int = 2  # sample source and template
    batch_size: int = 32
    learning_rate: float = 1e-3
    skip_projection: bool = False
    # composed refinement passes INSIDE the train-step loss (the original
    # PCRNet protocol trains through its iterations; a single-pass-trained
    # net collapses when passes are composed at eval — pass 2 sees
    # nearly-aligned pairs it never trained on)
    train_iterations: int = 1
    # fused ghost-BN Pallas kernel for the train-mode simplification chain
    # (ops/pallas/point_mlp_train_kernel.py; see nn/layers.py::PointMLP)
    fused_train: bool | None = None   # None = auto exact-fused on TPU
    fused_mode: str = "ghost"          # "exact": exact-BN fused variant
    fused_bf16: bool | None = None     # None = mode default


def pcrnet_losses(
    pcrnet: PCRNet, pcr_vars: dict, p0, p1, igt_vec, loss_type: int,
    iterations: int = 1,
) -> tuple[jax.Array, dict]:
    """Chamfer alignment loss + transform-error metrics (main.py:557-598).

    With `iterations > 1` the loss is taken on the COMPOSED estimate after
    that many refinement passes (differentiable through all of them) —
    iteration-matched training for the original PCRNet protocol.
    """
    if iterations == 1:
        twist, pre_quat = pcrnet.apply(pcr_vars, p0, p1)
        qnorm_loss = jnp.mean((jnp.sum(pre_quat**2, axis=1) - 1.0) ** 2)
        est = QuaternionTransform(twist)
    else:
        est = register_iterative(pcrnet, pcr_vars, p0, p1, iterations)
        qnorm_loss = jnp.zeros(())  # per-pass diagnostic not meaningful here
    gt = QuaternionTransform(igt_vec)
    # Single-pass: rotation-only chamfer, reference parity (main.py:573 on the
    # rotation-only QuaternionFixedDataset). Multi-pass: the iterated
    # trajectory advances with est.apply (rotation + translation), so the
    # loss must evaluate the COMPOSED estimate the same way or a nonzero
    # predicted translation would score a different cloud than was iterated.
    p1_est = est.rotate(p0) if iterations == 1 else est.apply(p0)
    c01, c10 = chamfer_distance(p1, p1_est)
    chamfer = jnp.mean(c01) + jnp.mean(c10)
    rot_err, norm_err, trans_err = est.compute_errors(gt)
    loss = norm_err + chamfer if loss_type == 0 else chamfer
    info = {
        "chamfer_loss": chamfer,
        "qnorm_loss": qnorm_loss,
        "rot_err_deg": rad_to_deg(rot_err),
        "norm_err": norm_err,
        "trans_err": trans_err,
    }
    return loss, info


def sampling_consistency(p0s, p1s, igt_vec) -> jax.Array:
    """Chamfer between template samples and inverse-rotated source samples.

    Returns the PER-SAMPLE consistency [B] (mean over points of both
    directions) so eval can slice off tail-batch padding before averaging —
    a batch-mean here would double-count the repeated padding cloud.
    """
    gt_inv = QuaternionTransform(igt_vec).inverse()
    p0s_est = gt_inv.rotate(p1s)
    c0, c1 = chamfer_distance(p0s, p0s_est)
    return jnp.mean(c0, axis=1) + jnp.mean(c1, axis=1)


def create_pcrnet_state(cfg: RegistrationConfig, rng) -> tuple[PCRNet, TrainState]:
    model = PCRNet()
    dummy = jnp.zeros((2, cfg.num_points, 3), jnp.float32)
    variables = model.init(rng, dummy, dummy)
    tx = adam_with_schedule(staircase_lr(cfg.learning_rate, cfg.batch_size))
    state = TrainState.create(params=variables["params"], batch_stats={}, tx=tx)
    return model, state


def create_sampler_state(cfg: RegistrationConfig, rng) -> tuple[SampleNet, TrainState]:
    sampler = SampleNet(
        num_out_points=cfg.num_out_points,
        bottleneck_size=cfg.bottleneck_size,
        group_size=cfg.group_size,
        min_sigma=1e-2,           # registration passes min_sigma=0.01
        sigma_mode="torch",
        skip_projection=cfg.skip_projection,
        fused_train=cfg.fused_train,
        fused_mode=cfg.fused_mode,
        fused_bf16=cfg.fused_bf16,
    )
    dummy = jnp.zeros((2, cfg.num_points, 3), jnp.float32)
    variables = sampler.init(rng, dummy, training=False)
    tx = adam_with_schedule(staircase_lr(cfg.learning_rate, cfg.batch_size))
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    return sampler, state


def make_pcrnet_train_step(model: PCRNet, cfg: RegistrationConfig):
    """Phase 1: train PCRNet on full clouds (no sampler)."""

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, p0, p1, igt_vec):
        def loss_fn(params):
            loss, info = pcrnet_losses(
                model, {"params": params}, p0, p1, igt_vec, cfg.loss_type,
                cfg.train_iterations)
            return loss, info

        (loss, info), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), {"loss": loss, **info}

    return step


def make_sampler_train_step(
    sampler: SampleNet, pcrnet: PCRNet, pcr_vars: dict, cfg: RegistrationConfig
):
    """Phase 2: train SampleNet against the frozen PCRNet
    (main.py:306-362 with compute_samplenet_loss + compute_pcrnet_loss)."""

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, p0, p1, igt_vec):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}

            (p1_simp, p1_proj), upd = sampler.apply(
                variables, p1, training=True, mutable=["batch_stats"])
            s1 = sampler.apply(
                variables, p1, p1_simp, cfg.num_out_points, cfg.gamma,
                cfg.delta, method=SampleNet.get_simplification_loss)

            if cfg.num_sampled_clouds == 2:
                (p0_simp, p0_proj), upd = sampler.apply(
                    {"params": params, "batch_stats": upd["batch_stats"]},
                    p0, training=True, mutable=["batch_stats"])
                s0 = sampler.apply(
                    variables, p0, p0_simp, cfg.num_out_points, cfg.gamma,
                    cfg.delta, method=SampleNet.get_simplification_loss)
                simplification = 0.5 * (s1 + s0)
                sampled = (p0_proj, p1_proj)
            else:
                simplification = s1
                sampled = (p0, p1_proj)

            projection = sampler.apply(
                variables, method=SampleNet.get_projection_loss)
            samplenet_loss = cfg.alpha * simplification + cfg.lmbda * projection

            task_loss, info = pcrnet_losses(
                pcrnet, pcr_vars, sampled[0], sampled[1], igt_vec,
                cfg.loss_type, cfg.train_iterations)
            loss = task_loss + samplenet_loss
            info = {**info, "simplification_loss": simplification,
                    "projection_loss": projection}
            return loss, (info, upd["batch_stats"])

        (loss, (info, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return (state.apply_gradients(grads, new_batch_stats=new_bs),
                {"loss": loss, **info})

    return step


def register_iterative(
    pcrnet: PCRNet, pcr_vars: dict, p0: jax.Array, p1: jax.Array,
    iterations: int = 1,
) -> QuaternionTransform:
    """Iteratively refined registration (the original PCRNet protocol; the
    reference applies a single pass). Each pass registers the transformed
    template against the source and composes the estimates."""
    b = p0.shape[0]
    q_total = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (b, 1))
    t_total = jnp.zeros((b, 3), jnp.float32)
    p0_cur = p0
    for _ in range(iterations):
        twist, _ = pcrnet.apply(pcr_vars, p0_cur, p1)
        est = QuaternionTransform(twist)
        p0_cur = est.apply(p0_cur)
        # compose: new transform acts after the accumulated one
        q_total = qmul(est.quat, q_total)
        t_total = qrot(est.quat, t_total) + est.trans
    return QuaternionTransform(jnp.concatenate([q_total, t_total], axis=-1))


def make_eval_step(
    sampler: SampleNet | None, pcrnet: PCRNet, pcr_vars: dict,
    cfg: RegistrationConfig, *, iterations: int = 1,
):
    """Test protocol: hard-sample both clouds (eval mode), register, report
    PER-SAMPLE rotation errors (the reference evaluates at batch_size=1,
    main.py:127 — batch-mean errors would inflate the AUC) + consistency."""

    @jax.jit
    def step(sampler_vars, p0, p1, igt_vec):
        if sampler is not None:
            _, p1s = sampler.apply(sampler_vars, p1, training=False)
            if cfg.num_sampled_clouds == 2:
                _, p0s = sampler.apply(sampler_vars, p0, training=False)
            else:
                p0s = p0
        else:
            p0s, p1s = p0, p1
        est = register_iterative(pcrnet, pcr_vars, p0s, p1s, iterations)
        gt = QuaternionTransform(igt_vec)
        rot_errs = rad_to_deg(est.rotation_errors(gt))        # [B] degrees
        trans_err = jnp.mean(jnp.sqrt((est.trans - gt.trans) ** 2))
        consistency = sampling_consistency(p0s, p1s, igt_vec)  # [B]
        return rot_errs, trans_err, consistency

    return step


def precision_auc(rotation_errors_deg: np.ndarray) -> tuple[np.ndarray, float]:
    """Precision curve over 0..180 deg (0.5 steps) + its AUC (main.py:461-479)."""
    thresholds = np.arange(0.0, 180.0, 0.5)
    n = len(rotation_errors_deg)
    precision = np.array([
        np.sum(rotation_errors_deg <= t) / max(n, 1) for t in thresholds
    ])
    return precision, float(np.sum(precision) / len(thresholds))


def evaluate(
    eval_step, sampler_vars, dataset, batch_size: int
) -> dict[str, float]:
    """Per-sample metric collection; the final partial batch is padded with
    repeats (static shapes for jit) and its padding sliced off, so no test
    sample is dropped."""
    rot_errs, consistencies = [], []
    total = len(dataset)
    items = [dataset[i] for i in range(total)]
    for s in range(0, total, batch_size):
        chunk = items[s : s + batch_size]
        real = len(chunk)
        while len(chunk) < batch_size:
            chunk.append(chunk[-1])
        p0 = np.stack([c[0] for c in chunk])
        p1 = np.stack([c[1] for c in chunk])
        tw = np.stack([c[2] for c in chunk])
        r, t, c = eval_step(
            sampler_vars, jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(tw))
        rot_errs.append(np.asarray(r)[:real])
        consistencies.append(np.asarray(c)[:real])
    rot = np.concatenate(rot_errs) if rot_errs else np.zeros(0)
    cons = np.concatenate(consistencies) if consistencies else np.zeros(0)
    _, auc = precision_auc(rot)
    return {
        "rot_err_mean": float(rot.mean()) if len(rot) else float("nan"),
        "rot_err_std": float(rot.std()) if len(rot) else float("nan"),
        "auc": auc,
        "consistency_mean": float(np.mean(cons)),
        "consistency_std": float(np.std(cons)),
    }
