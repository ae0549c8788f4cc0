"""Fused soft-projection Pallas kernel.

The soft projection (SoftProjection.project) is the hot op of every SampleNet
train step: for each query point, find k nearest neighbours in the input
cloud, softmax their negated scaled squared distances, and emit the convex
combination. The reference runs it as three separate CUDA ops with an
O(m*n) distance tensor round-tripping HBM (knn_point -> SelectionSort ->
group_point, classification/grouping/tf_grouping.py:64-91); the pure-XLA path
in this repo materialises [B, m, N] distances + a [B, m, k, 3] gather.

This kernel does the whole thing in ONE VMEM pass per (batch, query-tile):
  * distances [tm, N] built on the VPU from a [3, N]-layout point cloud
    (broadcast subtract + square, no MXU needed for a K=3 contraction);
  * k-NN via iterative min-extraction (k <= 16), the same strategy as the
    reference's SelectionSort but without ever writing distances to HBM;
  * streaming softmax: weights accumulate into (num, den) as neighbours are
    extracted in ascending distance order, so no [tm, k] buffer either.

Forward-only: training uses the differentiable XLA path; this kernel serves
inference/serving, where the projection is immediately hardened anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samplenet_tpu.ops.pallas.partitioning import batch_partition


def _soft_projection_kernel(
    sigma_ref,     # SMEM (1, 1): sigma^2
    pt_ref,        # VMEM (1, 3, N): point cloud, channel-major
    q_ref,         # VMEM (1, TM, 3): query tile
    out_ref,       # VMEM (1, TM, 3)
    idx_ref,       # VMEM (1, TM, K): int32 neighbour indices (ascending dist)
    *,
    group_size: int,
    n_points: int,
):
    sigma = sigma_ref[0, 0]
    pts = pt_ref[0]                      # [3, N]
    q = q_ref[0]                         # [TM, 3]
    tm = q.shape[0]

    # distance tile on the VPU: d2[i, j] = sum_c (q[i,c] - P[c,j])^2
    d2 = jnp.zeros((tm, n_points), jnp.float32)
    for c in range(3):
        diff = q[:, c][:, None] - pts[c, :][None, :]
        d2 = d2 + diff * diff

    col = jax.lax.broadcasted_iota(jnp.int32, (tm, n_points), 1)
    inf = jnp.float32(jnp.inf)

    # iterative min-extraction, unrolled (group_size is static and <= 16)
    d_min0 = jnp.zeros((tm,), jnp.float32)
    num = jnp.zeros((tm, 3), jnp.float32)
    den = jnp.zeros((tm,), jnp.float32)
    for i in range(group_size):
        d_i = jnp.min(d2, axis=1)                      # [TM]
        idx = jnp.argmin(d2, axis=1)                   # [TM]
        onehot = (col == idx[:, None]).astype(jnp.float32)
        # neighbour coordinates via 3 masked reductions (no dynamic gather)
        p_i = jnp.stack(
            [jnp.sum(onehot * pts[c, :][None, :], axis=1) for c in range(3)],
            axis=1,
        )                                              # [TM, 3]
        if i == 0:
            d_min0 = d_i   # ascending order: first min is the softmax shift
        w = jnp.exp(-(d_i - d_min0) / sigma)           # [TM]
        num = num + w[:, None] * p_i
        den = den + w
        idx_ref[0, :, i] = idx
        if i + 1 < group_size:
            d2 = jnp.where(onehot > 0, inf, d2)        # knock out the winner
    out_ref[0] = num / den[:, None]


def _fused_soft_projection_impl(point_cloud, query_cloud, sigma,
                                group_size, tile_m, interpret):
    b, n, _ = point_cloud.shape
    m = query_cloud.shape[1]
    tm = min(tile_m, m)
    pad_m = (-m) % tm
    if pad_m:
        query_cloud = jnp.pad(query_cloud, ((0, 0), (0, pad_m), (0, 0)))
    m_padded = m + pad_m

    pts_t = jnp.swapaxes(point_cloud, 1, 2).astype(jnp.float32)  # [B, 3, N]
    sigma_arr = jnp.asarray(sigma, jnp.float32).reshape(1, 1)

    kernel = functools.partial(
        _soft_projection_kernel, group_size=group_size, n_points=n
    )
    out, idx = pl.pallas_call(
        kernel,
        grid=(b, m_padded // tm),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tm, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, group_size), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, m_padded, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, m_padded, group_size), jnp.int32),
        ),
        interpret=interpret,
    )(sigma_arr, pts_t, query_cloud.astype(jnp.float32))
    return out[:, :m], idx[:, :m]


# SPMD: batch-shard the two clouds, replicate the scalar sigma (the empty
# term in the rule), run per-shard — the training hot op stays local to
# each device under a ('data', ...) mesh by construction.
_fused_soft_projection_cp = batch_partition(
    _fused_soft_projection_impl,
    rule="b n c, b m c, -> b m c, b m k",
    static_argnums=(3, 4, 5),
)


@functools.partial(jax.jit, static_argnames=("group_size", "tile_m", "interpret"))
def fused_soft_projection(
    point_cloud: jax.Array,   # [B, N, 3]
    query_cloud: jax.Array,   # [B, M, 3]
    sigma: jax.Array,         # scalar sigma^2
    *,
    group_size: int = 7,
    tile_m: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Fused SoftProjection.project forward. Returns [B, M, 3]."""
    return _fused_soft_projection_cp(
        point_cloud, query_cloud, jnp.asarray(sigma, jnp.float32),
        group_size, tile_m, interpret)


def _soft_project_ref(point_cloud, query_cloud, sigma, idx):
    """Differentiable recomputation from saved kNN indices (pure XLA)."""
    from samplenet_tpu.ops.knn import group_point

    grouped = group_point(point_cloud, idx)              # [B, M, k, 3]
    d2 = jnp.sum((grouped - query_cloud[:, :, None, :]) ** 2, axis=-1)
    w = jax.nn.softmax(-d2 / sigma, axis=-1)
    return jnp.sum(grouped * w[..., None], axis=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def soft_project(point_cloud, query_cloud, sigma, group_size=7,
                 tile_m=128, interpret=False):
    """Differentiable fused soft projection.

    Forward runs the Pallas kernel (one VMEM pass, also emitting neighbour
    indices); backward recomputes the gather+softmax from those indices in
    XLA — O(M*k) instead of O(M*N) — and autodiffs analytically. Gradients
    flow to point_cloud, query_cloud, AND sigma (the temperature), matching
    the pure-XLA training path.
    """
    out, _ = fused_soft_projection(
        point_cloud, query_cloud, sigma,
        group_size=group_size, tile_m=tile_m, interpret=interpret)
    return out


def _soft_project_fwd(point_cloud, query_cloud, sigma, group_size,
                      tile_m, interpret):
    out, idx = fused_soft_projection(
        point_cloud, query_cloud, sigma,
        group_size=group_size, tile_m=tile_m, interpret=interpret)
    return out, (point_cloud, query_cloud, sigma, idx)


def _soft_project_bwd(group_size, tile_m, interpret, residuals, g):
    point_cloud, query_cloud, sigma, idx = residuals
    _, vjp = jax.vjp(
        lambda p, q, s: _soft_project_ref(p, q, s, idx),
        point_cloud, query_cloud, sigma)
    return vjp(g)


soft_project.defvjp(_soft_project_fwd, _soft_project_bwd)
