"""Batched k-nearest-neighbour search and point grouping.

Replaces three reference native-op groups with pure-XLA formulations:
  * KNN_CUDA / `knn_point` (classification/grouping/tf_grouping.py:64-91):
    here a chunked matmul-distance + `lax.top_k`, ascending order like the
    reference's SelectionSort.
  * `group_point` / `GroupPoint` gather and its scatter-add gradient
    (classification/grouping/tf_grouping.cpp:41-63): `take_along_axis`, whose
    autodiff transpose is a deterministic XLA scatter-add.
  * `query_ball_point` radius grouping (tf_grouping.cpp:13-30): mask-based.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from samplenet_tpu.ops.pairwise import chunked_topk_neg, pairwise_sqdist


def knn_point(
    k: int, point_cloud: jax.Array, query_cloud: jax.Array, *, chunk: int = 512
) -> tuple[jax.Array, jax.Array]:
    """k nearest neighbours of each query point in `point_cloud`.

    Args:
      k: neighbourhood size.
      point_cloud: [B, N, 3] database cloud.
      query_cloud: [B, M, 3] query cloud.

    Returns:
      (dist, idx): [B, M, k] ascending squared distances, [B, M, k] int32
      indices into point_cloud.
    """
    return chunked_topk_neg(query_cloud, point_cloud, k, chunk=chunk)


def group_point(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather neighbour features.

    Args:
      points: [B, N, C] per-point features (or coordinates).
      idx: [B, M, K] int32 indices into the N axis.

    Returns:
      [B, M, K, C] grouped features. Differentiable in `points` via a
      deterministic scatter-add (vs the reference's atomicAdd CUDA grad,
      classification/grouping/tf_grouping_g.cu:69-78).
    """
    b, m, kk = idx.shape
    flat = idx.reshape(b, m * kk)
    gathered = jnp.take_along_axis(
        points, flat[..., None].astype(jnp.int32), axis=1
    )
    return gathered.reshape(b, m, kk, points.shape[-1])


def query_ball_point(
    radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array,
    *, chunk: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Radius neighbourhood grouping (tf_grouping.cpp:13-30 semantics).

    For each query point, the first `nsample` database points within `radius`
    (by index order); queries with fewer in-ball points repeat the first found
    point; queries with none fall back to index 0, count 0.

    The query axis is processed in sequential chunks (`lax.map`), so the live
    distance tile is [B, chunk, N] — never the full [B, M, N] (same doctrine
    as ops/pairwise.py).

    Returns:
      (idx [B, M, nsample] int32, pts_cnt [B, M] int32).
    """
    m = new_xyz.shape[1]
    n = xyz.shape[1]

    def one_chunk(queries):                                 # [B, mc, 3]
        d2 = pairwise_sqdist(queries, xyz)                  # [B, mc, N]
        in_ball = d2 < (radius * radius)
        order = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
        # in-ball points rank first, preserving index order
        key = jnp.where(in_ball, order, order + n)
        _, idx_sorted = jax.lax.top_k(-key, nsample)        # smallest keys
        idx_sorted = idx_sorted.astype(jnp.int32)
        pts_cnt = jnp.sum(in_ball, axis=-1).astype(jnp.int32)
        cnt_clip = jnp.clip(pts_cnt, 0, nsample)
        # positions beyond the count repeat the first in-ball index (or 0)
        first = idx_sorted[..., :1]
        first = jnp.where(pts_cnt[..., None] > 0, first, 0)
        pos = jax.lax.broadcasted_iota(jnp.int32, idx_sorted.shape, 2)
        idx = jnp.where(pos < cnt_clip[..., None], idx_sorted, first)
        return idx, jnp.minimum(pts_cnt, nsample)

    if m <= chunk:
        return one_chunk(new_xyz)
    mc = chunk
    pad = (-m) % mc
    q = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0))) if pad else new_xyz
    chunks = (m + pad) // mc
    q = jnp.moveaxis(q.reshape(q.shape[0], chunks, mc, 3), 1, 0)
    idx, cnt = jax.lax.map(one_chunk, q)                    # [chunks, B, ...]
    idx = jnp.moveaxis(idx, 0, 1).reshape(-1, chunks * mc, nsample)[:, :m]
    cnt = jnp.moveaxis(cnt, 0, 1).reshape(-1, chunks * mc)[:, :m]
    return idx, cnt


def select_top_k(k: int, dist: jax.Array) -> tuple[jax.Array, jax.Array]:
    """k smallest entries per row of a full distance matrix, ascending
    (`SelectionSort` op contract, classification/grouping/tf_grouping.cpp:32-38
    — the reference sorts the whole [B, M, N] matrix; top_k suffices for the
    k prefix every caller actually uses).

    Args:
      dist: [B, M, N] distances.

    Returns:
      (values [B, M, k] ascending, idx [B, M, k] int32).
    """
    neg, idx = jax.lax.top_k(-dist, k)
    return -neg, idx.astype(jnp.int32)
