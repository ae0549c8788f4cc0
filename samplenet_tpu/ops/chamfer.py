"""Chamfer / nn_distance: bidirectional nearest-neighbour squared distances.

Semantics match the reference native op `NnDistance` (CPU spec:
classification/structural_losses/tf_nndistance.cpp:21-43 — per-point squared
L2 distance to the nearest point of the other cloud, both directions, plus
argmin indices) and the torch `ChamferDistance` autograd function
(registration/src/chamfer_distance/chamfer_distance.py:14-66).

Gradient design: instead of a custom scatter kernel (the CUDA grad uses
atomicAdd — nondeterministic accumulation order), we freeze the argmin index
with `stop_gradient` and recompute the distance through a gather. Autodiff of
the gather gives exactly the reference gradient (±2g·(x1−x2) into both clouds)
via a deterministic XLA scatter-add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from samplenet_tpu.ops.pairwise import chunked_min_argmin


def nn_distance(
    xyz1: jax.Array, xyz2: jax.Array, *, chunk: int = 512
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Bidirectional NN squared distances and indices.

    Args:
      xyz1: [B, N, 3]
      xyz2: [B, M, 3]

    Returns:
      (dist1, idx1, dist2, idx2):
        dist1 [B, N] squared distance from each xyz1 point to nearest xyz2;
        idx1  [B, N] int32 index of that neighbour in xyz2;
        dist2/idx2 the reverse direction.

    Differentiable in xyz1 and xyz2; indices are non-differentiable.
    """
    _, idx1 = chunked_min_argmin(xyz1, xyz2, chunk=chunk)
    _, idx2 = chunked_min_argmin(xyz2, xyz1, chunk=chunk)
    idx1 = jax.lax.stop_gradient(idx1)
    idx2 = jax.lax.stop_gradient(idx2)
    nn1 = jnp.take_along_axis(xyz2, idx1[..., None], axis=1)  # [B, N, 3]
    nn2 = jnp.take_along_axis(xyz1, idx2[..., None], axis=1)  # [B, M, 3]
    dist1 = jnp.sum((xyz1 - nn1) ** 2, axis=-1)
    dist2 = jnp.sum((xyz2 - nn2) ** 2, axis=-1)
    return dist1, idx1, dist2, idx2


def chamfer_distance(
    xyz1: jax.Array, xyz2: jax.Array, *, chunk: int = 512
) -> tuple[jax.Array, jax.Array]:
    """Per-point squared NN costs both ways (torch ChamferDistance parity).

    Returns (cost_1to2 [B, N], cost_2to1 [B, M]).
    """
    d1, _, d2, _ = nn_distance(xyz1, xyz2, chunk=chunk)
    return d1, d2


def chamfer_loss(xyz1: jax.Array, xyz2: jax.Array) -> jax.Array:
    """Symmetric mean Chamfer loss (AE objective).

    Matches reconstruction/src/pointnet_ae.py:116-124: mean over points of
    each direction, summed, then mean over batch.
    """
    d1, d2 = chamfer_distance(xyz1, xyz2)
    return jnp.mean(jnp.mean(d1, axis=1) + jnp.mean(d2, axis=1))
