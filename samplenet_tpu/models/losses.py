"""Sampling losses (paper Eq. 1: L = L_task + alpha*L_simplify + lmbda*L_project).

Weight conventions per track (SURVEY.md section 0.3):
  classification: alpha=30, lmbda=1, gamma=1, delta=0, k=7
  progressive cls: gamma=0.5, delta=1/30
  registration:   alpha=0.01, lmbda=0.01, gamma=1, delta=0, k=8
  reconstruction: alpha=0.01, lmbda=1e-4, k=16 (size-scaled w = pc_size/64)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from samplenet_tpu.ops.chamfer import nn_distance


def simplification_loss(
    ref_pc: jax.Array,
    samp_pc: jax.Array,
    pc_size: int,
    gamma: float = 1.0,
    delta: float = 0.0,
) -> jax.Array:
    """mean CD(samp->ref) + mean-over-batch max-per-cloud CD(samp->ref)
    + (gamma + delta*pc_size) * mean CD(ref->samp).

    Parity: registration/src/samplenet.py:171-181 and
    classification/models/samplenet_model.py:176-188 (identical math).
    Both clouds are [B, *, 3].
    """
    cost_p1_p2, _, cost_p2_p1, _ = nn_distance(samp_pc, ref_pc)
    max_cost = jnp.mean(jnp.max(cost_p1_p2, axis=1))
    return (
        jnp.mean(cost_p1_p2)
        + max_cost
        + (gamma + delta * pc_size) * jnp.mean(cost_p2_p1)
    )


def reconstruction_simplification_loss(
    ref_pc: jax.Array,
    samp_pc: jax.Array,
    pc_size: int,
    is_denoising: bool = False,
) -> jax.Array:
    """Size-scaled variant used by the AE track
    (reconstruction/src/samplenet_pointnet_ae.py:165-189):
    w = pc_size/64; loss = mean CD(Q->P) + max + (2w if denoising else w)*mean CD(P->Q).
    """
    cost_p1_p2, _, cost_p2_p1, _ = nn_distance(samp_pc, ref_pc)
    max_cost = jnp.mean(jnp.max(cost_p1_p2, axis=1))
    w = pc_size / 64.0
    scale = 2.0 * w if is_denoising else w
    return jnp.mean(cost_p1_p2) + max_cost + scale * jnp.mean(cost_p2_p1)


def projection_loss(sigma: jax.Array) -> jax.Array:
    """The projection loss IS sigma^2 — drives the temperature toward zero so
    soft projection anneals to hard selection (samplenet.py:183-187)."""
    return sigma
