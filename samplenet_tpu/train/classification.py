"""Classification track: PointNet training + SampleNet-vs-frozen-classifier.

End-to-end TPU pipeline replacing classification/train_classifier.py,
train_samplenet.py and evaluate_samplenet.py: everything inside the step —
augmentation, sampler forward, soft projection, frozen classifier, losses,
optimiser — is one jitted SPMD program over the ('data','model') mesh. The
reference's per-h5-file feed loop with a host/device hop per batch
(train_samplenet.py:275-349) becomes device-resident training.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from samplenet_tpu.data import augment, iterate_batches, iterate_batches_padded
from samplenet_tpu.parallel.mesh import batch_sharding, replicated
from samplenet_tpu.models.pointnet_cls import (
    PointNetClassifier,
    classification_loss,
    pointnet_loss,
)
from samplenet_tpu.models.samplenet import SampleNet
from samplenet_tpu.train.state import (
    TrainState,
    adam_with_schedule,
    bn_decay_schedule,
    scheduled_bn_update,
    staircase_lr,
)


@dataclass
class ClassifierConfig:
    num_classes: int = 10
    num_points: int = 1024
    batch_size: int = 32
    learning_rate: float = 0.001
    decay_step: float = 200000.0
    decay_rate: float = 0.7
    use_tnets: bool = False
    augment: bool = True
    # TF-style scheduled BN decay 0.5 -> 0.99 (train_samplenet.py:124-133);
    # when on, BN modules run with momentum 0 and the EMA happens in-step.
    bn_schedule: bool = False
    # bf16 compute (params stay f32): halves MXU time on the per-point
    # matmuls; distance ops keep precision=HIGHEST regardless.
    bf16: bool = False


@dataclass
class SampleNetConfig:
    num_out_points: int = 32
    bottleneck_size: int = 128
    group_size: int = 7
    initial_temperature: float = 1.0
    min_sigma: float = 1e-2
    skip_projection: bool = False
    # loss weights (classification defaults, train_samplenet.py:39-47)
    alpha: float = 30.0
    lmbda: float = 1.0
    gamma: float = 1.0
    delta: float = 0.0
    learning_rate: float = 0.01
    decay_step: float = 600000.0
    decay_rate: float = 0.7
    batch_size: int = 32
    bn_schedule: bool = False
    bf16: bool = False
    # rematerialise the sampler forward in the backward pass instead of
    # stashing inter-layer activations: trades MXU FLOPs (plentiful at the
    # measured 4.2% MFU) for HBM activation traffic (the measured
    # bottleneck — BENCHMARKS.md train-step roofline)
    remat: bool = False
    # "bcn": channel-major training chain (N on the lanes; halves the
    # layout waste of C=64 f32 activations) — numerically identical
    conv_layout: str = "bnc"
    # fused ghost-BN train kernel for the simplification chain (opt-in;
    # nn/layers.py::PointMLP.fused_train)
    fused_train: bool | None = None   # None = auto exact-fused on TPU
    fused_mode: str = "ghost"          # "exact": exact-BN fused variant
    fused_bf16: bool | None = None     # None = mode default


# --------------------------------------------------------------- classifier

def create_classifier_state(
    cfg: ClassifierConfig, rng: jax.Array
) -> tuple[PointNetClassifier, TrainState]:
    model = PointNetClassifier(
        num_classes=cfg.num_classes, use_tnets=cfg.use_tnets,
        bn_momentum=0.0 if cfg.bn_schedule else 0.9,
        dtype=jnp.bfloat16 if cfg.bf16 else None)
    dummy = jnp.zeros((2, cfg.num_points, 3), jnp.float32)
    variables = model.init({"params": rng}, dummy, training=False)
    tx = adam_with_schedule(
        staircase_lr(cfg.learning_rate, cfg.batch_size, cfg.decay_step,
                     cfg.decay_rate)
    )
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    return model, state


def make_classifier_train_step(model: PointNetClassifier, cfg: ClassifierConfig):
    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, points, labels, rng):
        aug_rng, drop_rng = jax.random.split(rng)
        if cfg.augment:
            points = augment.augment_for_classification(aug_rng, points)

        def loss_fn(params):
            (logits, end_points), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                points, training=True,
                mutable=["batch_stats"], rngs={"dropout": drop_rng},
            )
            loss = pointnet_loss(logits, labels, end_points)
            return loss, (logits, updates["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if cfg.bn_schedule:
            decay = bn_decay_schedule(state.step, cfg.batch_size,
                                      decay_step_samples=cfg.decay_step)
            new_bs = scheduled_bn_update(state.batch_stats, new_bs, decay)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return state.apply_gradients(grads, new_batch_stats=new_bs), loss, acc

    return step


def make_classifier_eval_step(model: PointNetClassifier):
    @jax.jit
    def step(state: TrainState, points, labels):
        logits, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            points, training=False)
        return classification_loss(logits, labels), jnp.argmax(logits, -1) == labels

    return step


# ----------------------------------------------------- samplenet vs frozen

def create_samplenet_state(
    scfg: SampleNetConfig, num_points: int, rng: jax.Array
) -> tuple[SampleNet, TrainState]:
    sampler = SampleNet(
        num_out_points=scfg.num_out_points,
        bottleneck_size=scfg.bottleneck_size,
        group_size=scfg.group_size,
        initial_temperature=scfg.initial_temperature,
        min_sigma=scfg.min_sigma,
        skip_projection=scfg.skip_projection,
        sigma_mode="tf",  # classification track: sigma = t^2, no clamp
        bn_momentum=0.0 if scfg.bn_schedule else 0.9,
        dtype=jnp.bfloat16 if scfg.bf16 else None,
        conv_layout=scfg.conv_layout,
        fused_train=scfg.fused_train,
        fused_mode=scfg.fused_mode,
        fused_bf16=scfg.fused_bf16,
    )
    dummy = jnp.zeros((2, num_points, 3), jnp.float32)
    variables = sampler.init({"params": rng}, dummy, training=False)
    tx = adam_with_schedule(
        staircase_lr(scfg.learning_rate, scfg.batch_size, scfg.decay_step,
                     scfg.decay_rate)
    )
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    return sampler, state


def make_samplenet_train_step(
    sampler: SampleNet,
    classifier: PointNetClassifier,
    classifier_vars: dict,
    scfg: SampleNetConfig,
    augment_data: bool = True,
):
    """Sampler-only optimisation; classifier applied frozen (eval-mode BN,
    no dropout) exactly like the restored-frozen classifier graph in
    train_samplenet.py:169-171,195-199."""

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, points, labels, rng):
        if augment_data:
            points = augment.augment_for_classification(rng, points)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}

            def sampler_fwd(variables, points):
                return sampler.apply(variables, points, training=True,
                                     mutable=["batch_stats"])

            if scfg.remat:
                sampler_fwd = jax.checkpoint(sampler_fwd)
            (simp, proj), updates = sampler_fwd(variables, points)
            logits, _ = classifier.apply(classifier_vars, proj, training=False)
            task_loss = classification_loss(logits, labels)
            simp_loss = sampler.apply(
                variables, points, simp, scfg.num_out_points,
                scfg.gamma, scfg.delta, method=SampleNet.get_simplification_loss)
            proj_loss = sampler.apply(
                variables, method=SampleNet.get_projection_loss)
            loss = (task_loss + scfg.alpha * simp_loss + scfg.lmbda * proj_loss)
            aux = (logits, updates["batch_stats"], task_loss, simp_loss, proj_loss)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        logits, new_bs, task_loss, simp_loss, proj_loss = aux
        if scfg.bn_schedule:
            decay = bn_decay_schedule(state.step, scfg.batch_size,
                                      decay_step_samples=scfg.decay_step)
            new_bs = scheduled_bn_update(state.batch_stats, new_bs, decay)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        metrics = {"loss": loss, "task": task_loss, "simplification": simp_loss,
                   "projection": proj_loss, "acc": acc}
        return new_state, metrics

    return step


def make_samplenet_eval_step(
    sampler: SampleNet, classifier: PointNetClassifier, classifier_vars: dict
):
    """Eval = hard matching (unique+FPS) then frozen classifier — the
    evaluate_samplenet.py:99-277 protocol, entirely on device."""

    @jax.jit
    def step(state: TrainState, points, labels):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        _, matched = sampler.apply(variables, points, training=False)
        logits, _ = classifier.apply(classifier_vars, matched, training=False)
        return jnp.argmax(logits, -1) == labels

    return step


# -------------------------------------------------------------- train loops

def place_on_mesh(mesh, state):
    """Replicate a TrainState's arrays over a mesh (params/opt fully
    replicated; the batch axis carries the data parallelism)."""
    if mesh is None:
        return state
    rep = replicated(mesh)
    put = lambda t: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, t)
    return state.replace(params=put(state.params),
                         batch_stats=put(state.batch_stats),
                         opt_state=put(state.opt_state))


def _batch_placer(mesh):
    if mesh is None:
        return lambda a: jnp.asarray(a)
    sh = batch_sharding(mesh)
    return lambda a: jax.device_put(jnp.asarray(a), sh)


def train_classifier_loop(
    model, state, cfg: ClassifierConfig, train_data, test_data, *,
    epochs: int, logger, rng: jax.Array, steps_per_epoch: int | None = None,
    mesh=None, epoch_callback=None,
):
    train_step = make_classifier_train_step(model, cfg)
    eval_step = make_classifier_eval_step(model)
    data, labels = train_data
    state = place_on_mesh(mesh, state)
    place = _batch_placer(mesh)
    np_rng = np.random.RandomState(0)
    for epoch in range(epochs):
        losses, accs = [], []
        for bi, (bx, by) in enumerate(iterate_batches(
                data, labels, cfg.batch_size, rng=np_rng)):
            if steps_per_epoch is not None and bi >= steps_per_epoch:
                break
            rng, step_rng = jax.random.split(rng)
            state, loss, acc = train_step(
                state, place(bx), place(by), step_rng)
            losses.append(loss)
            accs.append(acc)
        test_acc = evaluate_classifier(eval_step, state, test_data, cfg.batch_size)
        logger.log(
            f"epoch {epoch}: loss={np.mean(jax.device_get(losses)):.4f} "
            f"train_acc={np.mean(jax.device_get(accs)):.4f} test_acc={test_acc:.4f}")
        logger.metrics(int(state.step), loss=np.mean(jax.device_get(losses)),
                       train_acc=np.mean(jax.device_get(accs)), test_acc=test_acc)
        if epoch_callback is not None:
            epoch_callback(epoch, state, test_acc)
    return state


def evaluate_classifier(eval_step, state, test_data, batch_size) -> float:
    """Full coverage: the tail batch is padded then sliced, so the result is
    independent of batch_size (no test cloud dropped)."""
    data, labels = test_data
    correct = []
    for bx, by, real in iterate_batches_padded(data, labels, batch_size):
        _, ok = eval_step(state, jnp.asarray(bx), jnp.asarray(by))
        correct.append(jax.device_get(ok)[:real])
    return float(np.mean(np.concatenate(correct)))


def train_samplenet_loop(
    sampler, state, scfg: SampleNetConfig, classifier, classifier_vars,
    train_data, test_data, *, epochs: int, logger, rng: jax.Array,
    steps_per_epoch: int | None = None, start_epoch: int = 0,
    epoch_callback=None, mesh=None,
):
    train_step = make_samplenet_train_step(sampler, classifier, classifier_vars, scfg)
    eval_step = make_samplenet_eval_step(sampler, classifier, classifier_vars)
    data, labels = train_data
    state = place_on_mesh(mesh, state)
    place = _batch_placer(mesh)
    np_rng = np.random.RandomState(start_epoch)
    for epoch in range(start_epoch, epochs):
        agg: dict[str, list] = {}
        for bi, (bx, by) in enumerate(iterate_batches(
                data, labels, scfg.batch_size, rng=np_rng)):
            if steps_per_epoch is not None and bi >= steps_per_epoch:
                break
            rng, step_rng = jax.random.split(rng)
            state, metrics = train_step(
                state, place(bx), place(by), step_rng)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(v)
        means = {k: float(np.mean(jax.device_get(v))) for k, v in agg.items()}
        test_acc = evaluate_samplenet(eval_step, state, test_data, scfg.batch_size)
        logger.log(f"epoch {epoch}: " +
                   " ".join(f"{k}={v:.4f}" for k, v in means.items()) +
                   f" eval_acc@{scfg.num_out_points}={test_acc:.4f}")
        logger.metrics(int(state.step), eval_acc=test_acc, **means)
        if epoch_callback is not None:
            epoch_callback(epoch, state, test_acc)
    return state


def evaluate_samplenet(eval_step, state, test_data, batch_size) -> float:
    """Full coverage (pad-and-slice), like evaluate_classifier."""
    data, labels = test_data
    correct = []
    for bx, by, real in iterate_batches_padded(data, labels, batch_size):
        ok = eval_step(state, jnp.asarray(bx), jnp.asarray(by))
        correct.append(jax.device_get(ok)[:real])
    return float(np.mean(np.concatenate(correct)))


def per_class_accuracy(
    eval_step, state, test_data, batch_size, num_classes
) -> np.ndarray:
    """Per-class accuracy table (evaluate_samplenet.py:273-277)."""
    data, labels = test_data
    correct = np.zeros(num_classes)
    seen = np.zeros(num_classes)
    for bx, by, real in iterate_batches_padded(data, labels, batch_size):
        ok = np.asarray(jax.device_get(eval_step(state, jnp.asarray(bx),
                                                 jnp.asarray(by))))
        for label, o in zip(by[:real], ok[:real]):
            seen[label] += 1
            correct[label] += float(o)
    return correct / np.maximum(seen, 1)
