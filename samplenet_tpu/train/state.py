"""Train state and optimizer assembly.

One unified trainer replaces the reference's three per-track training stacks
(SURVEY.md layer 5). Key behaviours reproduced:
  * exponential staircase LR decay with a floor
    (classification/train_samplenet.py:113-122: decay per sample count,
    clipped at 1e-5)
  * sampler-only optimisation against a frozen task network — the reference
    does var_list filtering (train_samplenet.py:195-199); here the frozen
    subtree simply lives outside the optimised params, which also guarantees
    zero compute is wasted on frozen grads.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, params, batch_stats, tx):
        return cls(
            step=jax.numpy.zeros((), jax.numpy.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt_state,
        )


def clone_state(tree):
    """Deep-copy every array leaf of a pytree (e.g. a TrainState).

    The train steps donate their input state's buffers to the output
    (jit donate_argnums=0) so params/opt-state are updated in place on TPU —
    halving peak HBM for the state at large batch. The flip side: the caller's
    OLD state object is dead after the call. Training loops that rebind
    `state = step(state, ...)` never notice; callers that must keep the old
    state alive (checkpoint comparisons, tests reusing a fixture) should pass
    `clone_state(state)` into the step instead.
    """
    return jax.tree_util.tree_map(
        lambda x: jax.numpy.copy(x) if hasattr(x, "dtype") else x, tree)


def staircase_lr(
    base_lr: float,
    batch_size: int,
    decay_step_samples: float = 200000.0,
    decay_rate: float = 0.7,
    floor: float = 1e-5,
) -> optax.Schedule:
    """Exponential staircase decay counted in samples, clipped below."""
    steps_per_decay = max(int(decay_step_samples / batch_size), 1)
    sched = optax.exponential_decay(
        init_value=base_lr,
        transition_steps=steps_per_decay,
        decay_rate=decay_rate,
        staircase=True,
    )
    return lambda count: jax.numpy.maximum(sched(count), floor)


def adam_with_schedule(
    schedule: optax.Schedule,
    weight_decay: float = 0.0,
    nonfinite_guard: bool = True,
) -> optax.GradientTransformation:
    """Adam, optionally with decoupled weight decay (the reference's
    optional regularisation losses, reconstruction/src/pointnet_ae.py:135-141
    / w_reg_alpha, as an optimizer-side equivalent).

    `nonfinite_guard` (default on, all four trainers) skips updates with
    NaN/inf gradients instead of poisoning the params: a single bad batch
    (observed in anger: approx-EMD AE training under heavy corruption hit
    one non-finite step at ~epoch 19 and every weight was NaN thereafter)
    costs one skipped step, while persistent divergence still surfaces
    after 5 consecutive failures. Changes the opt_state pytree structure —
    full snapshots taken without the guard don't restore into it.
    """
    if weight_decay > 0.0:
        tx = optax.adamw(learning_rate=schedule, weight_decay=weight_decay)
    else:
        tx = optax.adam(learning_rate=schedule)
    return with_nonfinite_guard(tx) if nonfinite_guard else tx


def bn_decay_schedule(
    step: jax.Array,
    batch_size: int,
    *,
    init_decay: float = 0.5,
    decay_rate: float = 0.5,
    decay_step_samples: float = 200000.0,
    clip: float = 0.99,
):
    """The reference's BatchNorm-decay schedule
    (classification/train_samplenet.py:124-133): momentum ramps
    1 - init_decay * rate^(samples/decay_step) from 0.5 toward `clip`.
    """
    samples = step.astype(jax.numpy.float32) * batch_size
    staircase = jax.numpy.floor(samples / decay_step_samples)
    momentum = init_decay * (decay_rate ** staircase)
    return jax.numpy.minimum(clip, 1.0 - momentum)


def scheduled_bn_update(old_stats, batch_stats, decay: jax.Array):
    """EMA of running stats with a step-dependent decay.

    Models must run their BatchNorm with momentum=0 (so `batch_stats` are
    the raw per-batch statistics); this applies
    new = decay*old + (1-decay)*batch — the same update flax would do with
    a fixed momentum, but with the TF-style scheduled decay.
    """
    return jax.tree_util.tree_map(
        lambda old, new: decay * old + (1.0 - decay) * new,
        old_stats, batch_stats,
    )


def with_nonfinite_guard(
    tx: optax.GradientTransformation, max_consecutive_errors: int = 5
) -> optax.GradientTransformation:
    """Skip optimiser updates whose gradients contain NaN/inf instead of
    poisoning the params — production fault containment the reference lacks
    (SURVEY.md §5: no failure detection). After `max_consecutive_errors`
    non-finite steps in a row the error propagates (real divergence)."""
    return optax.apply_if_finite(tx, max_consecutive_errors)
