"""SampleNetProgressive: nested (ordered) sampling — one checkpoint serves
every sample size.

Training (classification/train_samplenet_progressive.py:156-249): the sampler
emits max_num_out points once; for every prefix size 2^k in
[min_num_out .. max_num_out] the frozen task network scores the projected
prefix slice and a simplification loss scores the simplified prefix; the
per-size losses are SUMMED; only sampler variables train. The reference
builds a separate frozen classifier graph clone per size and copies weights
into each scope (restore_into_scope); here the same frozen apply runs per
prefix inside one jit — XLA shares the weights outright.

The AE variant (reconstruction/src/samplenet_progressive_pointnet_ae.py:70-110,
164-194) reuses one frozen AE over sizes and AVERAGES the per-size losses.

Inference (infer_samplenet_progressive.py:94-255): emit ordered outputs once
(simplified / soft-projected / hard-projected / matched+FPS-completed), then
evaluate any prefix length.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from samplenet_tpu.models.autoencoder import PointNetAE, ae_chamfer_loss
from samplenet_tpu.models.losses import (
    reconstruction_simplification_loss,
    simplification_loss,
)
from samplenet_tpu.models.pointnet_cls import PointNetClassifier, classification_loss
from samplenet_tpu.models.samplenet import SampleNet
from samplenet_tpu.models.soft_projection import SoftProjection
from samplenet_tpu.ops.matching import nn_match_from_clouds
from samplenet_tpu.train.state import TrainState, adam_with_schedule, staircase_lr


def progressive_sizes(min_out: int, max_out: int) -> tuple[int, ...]:
    sizes, b = [], min_out
    while b <= max_out:
        sizes.append(b)
        b *= 2
    return tuple(sizes)


@dataclass
class ProgressiveConfig:
    max_num_out_points: int = 1024
    min_num_out_points: int = 8
    bottleneck_size: int = 128
    group_size: int = 7
    # progressive classification weights (train_samplenet_progressive.py:40-41)
    alpha: float = 30.0
    lmbda: float = 1.0
    gamma: float = 0.5
    delta: float = 1.0 / 30.0
    learning_rate: float = 0.01
    batch_size: int = 32
    # fused ghost-BN Pallas kernel for the train-mode simplification chain
    # (ops/pallas/point_mlp_train_kernel.py; see nn/layers.py::PointMLP)
    fused_train: bool | None = None   # None = auto exact-fused on TPU
    fused_mode: str = "ghost"          # "exact": exact-BN fused variant
    fused_bf16: bool | None = None     # None = mode default

    @property
    def sizes(self) -> tuple[int, ...]:
        return progressive_sizes(self.min_num_out_points, self.max_num_out_points)


def create_progressive_state(
    cfg: ProgressiveConfig, num_points: int, rng
) -> tuple[SampleNet, TrainState]:
    sampler = SampleNet(
        num_out_points=cfg.max_num_out_points,
        bottleneck_size=cfg.bottleneck_size,
        group_size=cfg.group_size,
        sigma_mode="tf",
        fused_train=cfg.fused_train,
        fused_mode=cfg.fused_mode,
        fused_bf16=cfg.fused_bf16,
    )
    dummy = jnp.zeros((2, num_points, 3), jnp.float32)
    variables = sampler.init(rng, dummy, training=False)
    tx = adam_with_schedule(staircase_lr(cfg.learning_rate, cfg.batch_size,
                                         600000.0))
    return sampler, TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx)


def make_progressive_train_step(
    sampler: SampleNet,
    classifier: PointNetClassifier,
    classifier_vars: dict,
    cfg: ProgressiveConfig,
):
    sizes = cfg.sizes

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, points, labels):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (simp, proj), upd = sampler.apply(
                variables, points, training=True, mutable=["batch_stats"])
            loss_cls = 0.0
            loss_simp = 0.0
            accs = []
            for pc_size in sizes:
                logits, _ = classifier.apply(
                    classifier_vars, proj[:, :pc_size], training=False)
                loss_cls = loss_cls + classification_loss(logits, labels)
                loss_simp = loss_simp + simplification_loss(
                    points, simp[:, :pc_size], pc_size, cfg.gamma, cfg.delta)
                accs.append(jnp.mean(jnp.argmax(logits, -1) == labels))
            sigma = sampler.apply(variables, method=SampleNet.get_projection_loss)
            loss = loss_cls + cfg.alpha * loss_simp + cfg.lmbda * sigma
            return loss, (upd["batch_stats"], loss_cls, loss_simp, sigma,
                          jnp.stack(accs))

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_bs, loss_cls, loss_simp, sigma, accs = aux
        metrics = {"loss": loss, "classifier": loss_cls,
                   "simplification": loss_simp, "projection": sigma}
        metrics.update({f"acc@{s}": a for s, a in zip(sizes, accs)})
        return state.apply_gradients(grads, new_batch_stats=new_bs), metrics

    return step


def make_progressive_infer_step(sampler: SampleNet, num_out_points: int):
    """Ordered outputs: (simplified, soft, hard, matched) — the four h5 dump
    trees of infer_samplenet_progressive, one jitted call."""

    @jax.jit
    def step(state: TrainState, points):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        simp = sampler.apply(variables, points, training=False,
                             method=SampleNet.simplify)
        soft, _, _ = sampler.apply(variables, points, simp,
                                   method=lambda m, pc, q: m.project.project(pc, q))
        hard, _, _ = sampler.apply(
            variables, points, simp,
            method=lambda m, pc, q: m.project.project(pc, q, hard=True))
        # same dispatch as the eval forward: Pallas 1-NN on TPU,
        # chunked_min_argmin fallback elsewhere (ops/matching.py)
        matched, _ = nn_match_from_clouds(points, simp, num_out_points)
        return simp, soft, hard, matched

    return step


def evaluate_prefixes(
    infer_step, state, classifier, classifier_vars, data, labels,
    sizes, batch_size: int,
) -> dict[int, float]:
    """Accuracy at every prefix length of the matched ordered output
    (evaluate_from_files.py:175-190) — without the h5 round-trip."""
    from samplenet_tpu.data import iterate_batches_padded

    @jax.jit
    def classify(matched_prefix, labels):
        logits, _ = classifier.apply(classifier_vars, matched_prefix,
                                     training=False)
        return jnp.argmax(logits, -1) == labels

    correct = {s: [] for s in sizes}
    for bx, by, real in iterate_batches_padded(data, labels, batch_size):
        _, _, _, matched = infer_step(state, jnp.asarray(bx))
        for s in sizes:
            ok = classify(matched[:, :s], jnp.asarray(by))
            correct[s].append(np.asarray(ok)[:real])
    return {s: float(np.mean(np.concatenate(v))) for s, v in correct.items()}


def evaluate_ae_prefix_nre(
    sampler: SampleNet, state, ae, ae_vars: dict, data, sizes,
    batch_size: int,
) -> dict[int, dict[str, float]]:
    """Prefix-NRE curve of a progressive sampler against a frozen AE
    (reconstruction/sampler/evaluate_samplenet_progressive.py:92-153): one
    inference pass produces the ORDERED matched cloud at max(sizes); each
    prefix slice is reconstructed by the AE and scored as
    NRE(s) = CD(recon from first s samples) / CD(recon from full input).

    Returns {size: {"loss_sampled", "loss_full", "nre"}}.
    """
    from samplenet_tpu.data import iterate_batches_padded
    from samplenet_tpu.models.autoencoder import ae_per_cloud_chamfer

    m_max = max(sizes)
    infer = make_progressive_infer_step(sampler, m_max)

    @jax.jit
    def recon_full_loss(x):
        recon = ae.apply(ae_vars, x, training=False)
        return ae_per_cloud_chamfer(recon, x)

    @jax.jit
    def recon_prefix_loss(prefix, x):
        recon = ae.apply(ae_vars, prefix, training=False)
        return ae_per_cloud_chamfer(recon, x)

    labels = np.zeros(len(data), np.int32)
    per_size: dict[int, list] = {s: [] for s in sizes}
    full_losses: list[np.ndarray] = []
    for bx, _, real in iterate_batches_padded(data, labels, batch_size):
        x = jnp.asarray(bx)
        _, _, _, matched = infer(state, x)
        full_losses.append(np.asarray(recon_full_loss(x))[:real])
        for s in sizes:
            ls = recon_prefix_loss(matched[:, :s], x)
            per_size[s].append(np.asarray(ls)[:real])
    full = float(np.concatenate(full_losses).mean())
    out = {}
    for s in sizes:
        sampled = float(np.concatenate(per_size[s]).mean())
        out[s] = {"loss_sampled": sampled, "loss_full": full,
                  "nre": sampled / max(full, 1e-12)}
    return out


# ------------------------------------------------------------- AE variant

@dataclass
class ProgressiveAEConfig:
    max_num_out_points: int = 2048
    min_num_out_points: int = 16
    bottleneck_size: int = 128
    group_size: int = 16
    alpha: float = 0.01
    lmbda: float = 0.0001
    is_denoising: bool = False
    learning_rate: float = 5e-4
    batch_size: int = 50

    @property
    def sizes(self) -> tuple[int, ...]:
        return progressive_sizes(self.min_num_out_points, self.max_num_out_points)


def make_progressive_ae_train_step(
    sampler: SampleNet, ae: PointNetAE, ae_vars: dict, cfg: ProgressiveAEConfig
):
    """Per-size losses AVERAGED (samplenet_progressive_pointnet_ae.py:164-194)."""
    sizes = cfg.sizes

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, x):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (q, s), upd = sampler.apply(
                variables, x, training=True, mutable=["batch_stats"])
            loss_ae = 0.0
            loss_simp = 0.0
            for pc_size in sizes:
                recon = ae.apply(ae_vars, s[:, :pc_size], training=False)
                loss_ae = loss_ae + ae_chamfer_loss(recon, x)
                loss_simp = loss_simp + reconstruction_simplification_loss(
                    x, q[:, :pc_size], pc_size, cfg.is_denoising)
            loss_ae = loss_ae / len(sizes)
            loss_simp = loss_simp / len(sizes)
            sigma = sampler.apply(variables, method=SampleNet.get_projection_loss)
            loss = loss_ae + cfg.alpha * loss_simp + cfg.lmbda * sigma
            return loss, (upd["batch_stats"], loss_ae, loss_simp, sigma)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_bs, loss_ae, loss_simp, sigma = aux
        metrics = {"loss": loss, "ae": loss_ae,
                   "simplification": loss_simp, "projection": sigma}
        return state.apply_gradients(grads, new_batch_stats=new_bs), metrics

    return step
