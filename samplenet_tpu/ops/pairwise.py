"""Batched pairwise squared-distance primitives.

All point-cloud ops in this framework bottom out in pairwise squared L2
distances between two clouds. On TPU we compute them MXU-style:

    d2(x, y) = |x|^2 + |y|^2 - 2 <x, y>

so the O(N*M*C) work rides the systolic array as a batched matmul instead of
a gather/loop formulation (the reference uses hand-written CUDA tile loops,
e.g. classification/structural_losses/tf_nndistance_g.cu:5-100).

For large N*M the full [B, N, M] tensor is chunked over the query axis so the
working set stays bounded; reductions (min / top-k) happen per chunk and never
materialise the full matrix at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_sqdist(
    x: jax.Array,
    y: jax.Array,
    *,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Full pairwise squared distances.

    Args:
      x: [..., N, C]
      y: [..., M, C]
      precision: matmul precision. HIGHEST (f32) by default — TPU matmuls
        otherwise run bf16 passes, which perturbs near-tie argmins.

    Returns:
      [..., N, M] squared L2 distances, computed in f32.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)          # [..., N, 1]
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)          # [..., M, 1]
    xy = jnp.einsum(
        "...nc,...mc->...nm",
        x,
        y,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    d2 = x2 - 2.0 * xy + jnp.swapaxes(y2, -1, -2)
    # matmul round-off can push tiny distances slightly negative
    return jnp.maximum(d2, 0.0)


def _chunk_starts(n: int, chunk: int) -> list[int]:
    return list(range(0, n, chunk))


def chunked_min_argmin(
    x: jax.Array, y: jax.Array, *, chunk: int = 512
) -> tuple[jax.Array, jax.Array]:
    """Nearest neighbour of every x-point in y, chunked over N.

    Args:
      x: [B, N, C] queries.
      y: [B, M, C] database.

    Returns:
      (dist, idx): [B, N] squared distance to NN, [B, N] int32 NN index in y.
    """
    b, n, _ = x.shape
    if n <= chunk:
        d2 = pairwise_sqdist(x, y)
        return jnp.min(d2, axis=-1), jnp.argmin(d2, axis=-1).astype(jnp.int32)

    pad = (-n) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    num_chunks = x.shape[1] // chunk
    xc = x.reshape(b, num_chunks, chunk, x.shape[-1]).transpose(1, 0, 2, 3)

    def body(carry, xq):
        d2 = pairwise_sqdist(xq, y)
        return carry, (jnp.min(d2, axis=-1), jnp.argmin(d2, axis=-1).astype(jnp.int32))

    _, (dist, idx) = jax.lax.scan(body, None, xc)
    dist = dist.transpose(1, 0, 2).reshape(b, -1)[:, :n]
    idx = idx.transpose(1, 0, 2).reshape(b, -1)[:, :n]
    return dist, idx


def chunked_topk_neg(
    x: jax.Array, y: jax.Array, k: int, *, chunk: int = 512
) -> tuple[jax.Array, jax.Array]:
    """k nearest neighbours of every x-point in y (smallest squared distance).

    Returns:
      (dist, idx): [B, N, k] sorted ascending squared distances and int32
      indices into y. Replaces the reference's full-distance-matrix
      SelectionSort path (classification/grouping/tf_grouping.py:64-91) with a
      chunked top-k that never holds more than [B, chunk, M] at once.
    """
    b, n, _ = x.shape

    def one_chunk(xq):
        d2 = pairwise_sqdist(xq, y)
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx.astype(jnp.int32)

    if n <= chunk:
        return one_chunk(x)

    pad = (-n) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    num_chunks = x.shape[1] // chunk
    xc = x.reshape(b, num_chunks, chunk, x.shape[-1]).transpose(1, 0, 2, 3)

    def body(carry, xq):
        return carry, one_chunk(xq)

    _, (dist, idx) = jax.lax.scan(body, None, xc)
    dist = dist.transpose(1, 0, 2, 3).reshape(b, -1, k)[:, :n]
    idx = idx.transpose(1, 0, 2, 3).reshape(b, -1, k)[:, :n]
    return dist, idx
