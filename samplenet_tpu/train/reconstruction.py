"""Reconstruction track: AE training + SampleNet-vs-frozen-AE + NRE eval.

Replaces reconstruction/src/{autoencoder,pointnet_ae,sampler_autoencoder,
samplenet_pointnet_ae}.py: one jitted step trains the AE (chamfer or
approx-EMD); a second trains the SampleNet sampler (reconstruction variant:
conv widths [64,128,128,256,128], FC head without BN, SoftProjection k=16
with sigma = max(t, eps)^2) against the frozen AE with the size-scaled
simplification loss (samplenet_pointnet_ae.py:165-189). Evaluation reports
per-cloud reconstruction chamfer and the paper's NRE = CD(recon from
sampled) / CD(recon from full input) (sampler/evaluate_samplenet.py:145-152).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from samplenet_tpu.data import iterate_batches_padded
from samplenet_tpu.models.autoencoder import (
    PointNetAE,
    ae_chamfer_loss,
    ae_emd_loss,
    ae_per_cloud_chamfer,
    ae_soft_assignment_loss,
)
from samplenet_tpu.models.losses import reconstruction_simplification_loss
from samplenet_tpu.models.samplenet import SampleNet
from samplenet_tpu.train.state import TrainState, adam_with_schedule, staircase_lr


@dataclass
class AEConfig:
    num_points: int = 2048
    bottleneck_size: int = 128
    loss: str = "chamfer"          # 'chamfer' | 'emd' | 'softassign'
    emd_fast: bool = False         # bf16 match levels (ops.matching fast_math)
    emd_kernel: bool | None = None  # None = fused Pallas EMD auto on TPU;
    #   False pins the XLA scan (kernel-vs-XLA quality A/Bs)
    batch_size: int = 50           # default_train_params (ae_templates.py:46-56)
    learning_rate: float = 5e-4
    use_fps: bool = False          # FPS front-end (pointnet_ae.py:46-56)
    n_sample_points: int = 2048
    # >0 enables denoising training: the step consumes a (noisy input,
    # clean gt) pair — the reference keeps separate x/gt placeholders for
    # exactly this (reconstruction/src/autoencoder.py:121-129).
    denoising_sigma: float = 0.0
    # fused Pallas kernel for the train-mode encoder chain
    fused_train: bool | None = None   # None = auto exact-fused on TPU
    fused_mode: str = "ghost"          # "exact": exact-BN fused variant
    fused_bf16: bool | None = None     # None = mode default


@dataclass
class SampleNetAEConfig:
    num_out_points: int = 64
    bottleneck_size: int = 128
    group_size: int = 16
    # sampler/train_samplenet.py:46-51 defaults
    alpha: float = 0.01
    lmbda: float = 0.0001
    is_denoising: bool = False
    batch_size: int = 50
    learning_rate: float = 5e-4
    emd_fast: bool = False         # bf16 match levels when the AE loss is emd
    emd_kernel: bool | None = None  # as AEConfig.emd_kernel
    # fused Pallas kernel for the train-mode simplification chain
    # (see nn/layers.py::PointMLP.fused_train / fused_mode / fused_bf16)
    fused_train: bool | None = None   # None = auto exact-fused on TPU
    fused_mode: str = "ghost"          # "exact": exact-BN fused variant
    fused_bf16: bool | None = None     # None = mode default


def _ae_loss_fn(loss_name: str, emd_fast: bool = False,
                emd_kernel: bool | None = None):
    if loss_name == "emd":
        return functools.partial(ae_emd_loss, fast_math=emd_fast,
                                 use_pallas=emd_kernel)
    fns = {"chamfer": ae_chamfer_loss,
           "softassign": ae_soft_assignment_loss}
    return fns[loss_name]


def create_ae_state(cfg: AEConfig, rng) -> tuple[PointNetAE, TrainState]:
    model = PointNetAE(num_output_points=cfg.num_points,
                       bottleneck_size=cfg.bottleneck_size,
                       fused_train=cfg.fused_train,
                       fused_mode=cfg.fused_mode,
                       fused_bf16=cfg.fused_bf16)
    dummy = jnp.zeros((2, cfg.n_sample_points, 3), jnp.float32)
    variables = model.init(rng, dummy, training=False)
    tx = adam_with_schedule(staircase_lr(cfg.learning_rate, cfg.batch_size))
    return model, TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx)


def make_ae_train_step(model: PointNetAE, cfg: AEConfig):
    """AE train step. `step(state, x)` reconstructs x against itself;
    `step(state, x, gt)` trains noisy->clean (x = corrupted input, gt =
    clean target — the reference's split x/gt placeholders,
    autoencoder.py:121-129). The state buffers are donated."""
    loss_fn_inner = _ae_loss_fn(cfg.loss, cfg.emd_fast, cfg.emd_kernel)

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, x, gt=None):
        from samplenet_tpu.ops.fps import farthest_point_sample_with_points

        target = x if gt is None else gt
        if cfg.use_fps and cfg.n_sample_points < x.shape[1]:
            _, s = farthest_point_sample_with_points(cfg.n_sample_points, x)
        else:
            s = x[:, : cfg.n_sample_points]

        def loss_fn(params):
            recon, upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                s, training=True, mutable=["batch_stats"])
            return loss_fn_inner(recon, target), upd["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=new_bs), loss

    return step


def make_ae_eval_step(model: PointNetAE):
    @jax.jit
    def step(state: TrainState, x):
        recon = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, training=False)
        return ae_per_cloud_chamfer(recon, x)

    return step


def make_recon_sampler(cfg: SampleNetAEConfig) -> SampleNet:
    """Reconstruction-track sampler variant (src/samplers.py:22-38):
    conv widths [64,128,128,256]->bneck 128, FC head [256,256] without BN."""
    return SampleNet(
        num_out_points=cfg.num_out_points,
        bottleneck_size=cfg.bottleneck_size,
        group_size=cfg.group_size,
        conv_widths=(64, 128, 128, 256),
        fc_widths=(256, 256),
        fc_bn=False,
        sigma_mode="recon",
        min_sigma=1e-2,
        fused_train=cfg.fused_train,
        fused_mode=cfg.fused_mode,
        fused_bf16=cfg.fused_bf16,
    )


def create_sampler_ae_state(
    cfg: SampleNetAEConfig, num_points: int, rng
) -> tuple[SampleNet, TrainState]:
    sampler = make_recon_sampler(cfg)
    dummy = jnp.zeros((2, num_points, 3), jnp.float32)
    variables = sampler.init(rng, dummy, training=False)
    tx = adam_with_schedule(staircase_lr(cfg.learning_rate, cfg.batch_size))
    return sampler, TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx)


def make_sampler_ae_train_step(
    sampler: SampleNet, ae: PointNetAE, ae_vars: dict,
    cfg: SampleNetAEConfig, ae_loss: str = "chamfer",
):
    loss_fn_inner = _ae_loss_fn(ae_loss, cfg.emd_fast, cfg.emd_kernel)

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, x, gt=None):
        # x is the (possibly corrupted) sampler input; gt the clean target.
        # The simplification loss stays against x — the reference computes it
        # on the input placeholder (samplenet_pointnet_ae.py:165-189) — while
        # the AE loss targets gt, with the 2w denoising weight from
        # cfg.is_denoising.
        target = x if gt is None else gt

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (q, s), upd = sampler.apply(
                variables, x, training=True, mutable=["batch_stats"])
            # frozen AE on the soft-projected sample
            recon = ae.apply(ae_vars, s, training=False)
            loss_ae = loss_fn_inner(recon, target)
            loss_simp = reconstruction_simplification_loss(
                x, q, cfg.num_out_points, cfg.is_denoising)
            sigma = sampler.apply(variables, method=SampleNet.get_projection_loss)
            loss = loss_ae + cfg.alpha * loss_simp + cfg.lmbda * sigma
            return loss, (upd["batch_stats"], loss_ae, loss_simp, sigma)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_bs, loss_ae, loss_simp, sigma = aux
        metrics = {"loss": loss, "ae": loss_ae,
                   "simplification": loss_simp, "projection": sigma}
        return state.apply_gradients(grads, new_batch_stats=new_bs), metrics

    return step


def make_sampler_ae_eval_step(sampler: SampleNet, ae: PointNetAE, ae_vars: dict):
    """Per-cloud chamfer of reconstructions from hard-sampled vs full input;
    their ratio is the NRE. `step(state, x, gt)` evaluates the denoising
    protocol: sample/reconstruct from the noisy x, score against clean gt."""

    @jax.jit
    def step(state: TrainState, x, gt=None):
        target = x if gt is None else gt
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        _, matched = sampler.apply(variables, x, training=False)
        recon_sampled = ae.apply(ae_vars, matched, training=False)
        recon_full = ae.apply(ae_vars, x, training=False)
        return (ae_per_cloud_chamfer(recon_sampled, target),
                ae_per_cloud_chamfer(recon_full, target))

    return step


def make_fps_ae_eval_step(ae: PointNetAE, ae_vars: dict, num_out_points: int):
    """FPS-baseline counterpart of make_sampler_ae_eval_step: reconstruct
    from `num_out_points` FPS-sampled points vs the full input — the
    paper's NRE baseline (reference sampler/evaluate_samplenet.py scores
    SampleNet NRE against exactly this FPS reference)."""
    from samplenet_tpu.ops.fps import farthest_point_sample_with_points

    @jax.jit
    def step(state, x, gt=None):
        del state  # signature-compatible with evaluate_nre's eval_step
        target = x if gt is None else gt
        _, sampled = farthest_point_sample_with_points(num_out_points, x)
        recon_sampled = ae.apply(ae_vars, sampled, training=False)
        recon_full = ae.apply(ae_vars, x, training=False)
        return (ae_per_cloud_chamfer(recon_sampled, target),
                ae_per_cloud_chamfer(recon_full, target))

    return step


def evaluate_nre(
    eval_step, state, data: np.ndarray, batch_size: int, *, noise_fn=None
) -> dict:
    """Mean reconstruction losses + NRE over a dataset (full coverage: the
    tail batch is padded for the jit call, then sliced). `noise_fn` corrupts
    the model input while the clean cloud stays the scoring target
    (denoising NRE)."""
    sampled_losses, full_losses = [], []
    labels = np.zeros(len(data), np.int32)
    for bx, _, real in iterate_batches_padded(data, labels, batch_size):
        if noise_fn is None:
            ls, lf = eval_step(state, jnp.asarray(bx))
        else:
            ls, lf = eval_step(state, jnp.asarray(noise_fn(bx)),
                               jnp.asarray(bx))
        sampled_losses.append(np.asarray(ls)[:real])
        full_losses.append(np.asarray(lf)[:real])
    sampled = np.concatenate(sampled_losses)
    full = np.concatenate(full_losses)
    return {
        "loss_sampled_mean": float(sampled.mean()),
        "loss_full_mean": float(full.mean()),
        "nre": float(sampled.mean() / max(full.mean(), 1e-12)),
    }
