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

import functools

import jax
import jax.numpy as jnp

from samplenet_tpu.ops.pairwise import chunked_min_argmin


def _take_rows(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather [B, K] from [B, M, C] -> [B, K, C].

    TPU dynamic gathers are serialized: gathering 1024 rows from a 32-row
    table costs ~7.3 ms at B=1024 where the equivalent one-hot matmul costs
    1.7 ms. Use the matmul form whenever the source table is small enough
    that the one-hot tensor is cheap.
    """
    m = points.shape[1]
    if m <= 128:
        slots = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
        onehot = (idx[:, :, None] == slots).astype(points.dtype)
        return jnp.einsum("bkm,bmc->bkc", onehot, points,
                          preferred_element_type=points.dtype)
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def _forward(xyz1, xyz2, chunk):
    _, idx1 = chunked_min_argmin(xyz1, xyz2, chunk=chunk)
    _, idx2 = chunked_min_argmin(xyz2, xyz1, chunk=chunk)
    idx1 = jax.lax.stop_gradient(idx1)
    idx2 = jax.lax.stop_gradient(idx2)
    nn1 = _take_rows(xyz2, idx1)  # [B, N, 3]
    nn2 = _take_rows(xyz1, idx2)  # [B, M, 3]
    dist1 = jnp.sum((xyz1 - nn1) ** 2, axis=-1)
    dist2 = jnp.sum((xyz2 - nn2) ** 2, axis=-1)
    return dist1, idx1, dist2, idx2


def _scatter_rows(idx: jax.Array, vals: jax.Array, out_rows: int) -> jax.Array:
    """sum_i onehot(idx[b,i]) * vals[b,i,:] -> [B, out_rows, 3].

    TPU scatter-add is serialized and dominates the naive chamfer backward
    (24 ms vs a 1.2 ms forward at [1024, 1024<->32]); formulating the
    scatter as a one-hot matmul puts it on the MXU instead.
    """
    onehot = (idx[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, out_rows), 2)).astype(vals.dtype)
    return jnp.einsum("bnm,bnc->bmc", onehot, vals,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _nn_distance_vjp(xyz1, xyz2, chunk):
    return _forward(xyz1, xyz2, chunk)


def _nn_distance_fwd(xyz1, xyz2, chunk):
    out = _forward(xyz1, xyz2, chunk)
    _, idx1, _, idx2 = out
    return out, (xyz1, xyz2, idx1, idx2)


def _nn_distance_bwd(chunk, residuals, cotangents):
    xyz1, xyz2, idx1, idx2 = residuals
    g1, _, g2, _ = cotangents  # index cotangents are symbolic zeros
    nn1 = _take_rows(xyz2, idx1)
    nn2 = _take_rows(xyz1, idx2)
    v1 = 2.0 * g1[..., None] * (xyz1 - nn1)          # [B, N, 3]
    v2 = 2.0 * g2[..., None] * (xyz2 - nn2)          # [B, M, 3]
    dx1 = v1 - _scatter_rows(idx2, v2, xyz1.shape[1])
    dx2 = v2 - _scatter_rows(idx1, v1, xyz2.shape[1])
    return dx1, dx2


_nn_distance_vjp.defvjp(_nn_distance_fwd, _nn_distance_bwd)


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

    Differentiable in xyz1 and xyz2 (custom VJP: the +-2g(x-y) pull/push of
    the reference's NnDistanceGrad, with the scatter side expressed as a
    one-hot matmul); indices are non-differentiable.
    """
    return _nn_distance_vjp(jnp.asarray(xyz1), jnp.asarray(xyz2), chunk)


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
