"""Farthest point sampling (FPS) as an on-device iterative scan.

Semantics match the reference GPU op `FarthestPointSample`
(reconstruction/external/sampling/tf_sampling_g.cu:105+ — greedy max-min,
first selected index is 0) and the numpy seeded variant `_fps_from_given_pc`
(registration/src/sputils.py:11-23 — distances initialised from a given
prefix of points, then greedy completion).

The sequential dependency over the m output points is inherent to FPS; we
express it as one `lax.scan` whose per-step work ([B, N] distance update +
argmax) is batched wide across B and vectorised across N, keeping the
distance buffer resident on-device (the reference keeps a 3072-point buffer
in CUDA shared memory; here XLA keeps [B, N] in VMEM between fused steps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_point(points: jax.Array, idx: jax.Array) -> jax.Array:
    """[B, N, C] points gathered by [B, M] int indices -> [B, M, C]."""
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def _sqdist_to(points: jax.Array, sel_xyz: jax.Array) -> jax.Array:
    """Squared distance of every point to one selected point per batch.

    points [B, N, C], sel_xyz [B, C] -> [B, N].
    """
    diff = points - sel_xyz[:, None, :]
    return jnp.sum(diff * diff, axis=-1)


def _pallas_fps_available(points: jax.Array) -> bool:
    """The Pallas kernel runs on real TPU backends (25x the XLA scan at
    m=1024); the XLA path serves CPU/GPU and 2-D feature spaces."""
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend not in ("cpu", "gpu") and points.shape[-1] == 3


def farthest_point_sample(
    npoint: int, points: jax.Array, *, start_idx: jax.Array | int = 0,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Greedy farthest point sampling.

    Args:
      npoint: number of points to select (static).
      points: [B, N, C] input cloud.
      start_idx: first selected index — scalar or [B] int array. The
        reference op always starts at 0 (tf_sampling_g.cu); random-start FPS
        (registration/src/fps.py:8-43 permutes first) is `start_idx=rand`.
      use_pallas: force the fused VMEM-resident kernel on/off; default
        auto-selects it on TPU backends.

    Returns:
      [B, npoint] int32 selected indices.
    """
    points = jnp.asarray(points)
    if use_pallas is None:
        use_pallas = _pallas_fps_available(points)
    if use_pallas:
        from samplenet_tpu.ops.pallas.fps_kernel import (
            farthest_point_sample_pallas,
        )

        return farthest_point_sample_pallas(npoint, points,
                                            start_idx=start_idx)
    b, n, _ = points.shape
    if isinstance(start_idx, int):
        start = jnp.full((b,), start_idx, dtype=jnp.int32)
    else:
        start = jnp.asarray(start_idx, dtype=jnp.int32)

    def step(carry, _):
        dist, sel = carry
        sel_xyz = jnp.take_along_axis(points, sel[:, None, None], axis=1)[:, 0]
        dist = jnp.minimum(dist, _sqdist_to(points, sel_xyz))
        nxt = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        return (dist, nxt), sel

    init = (jnp.full((b, n), jnp.inf, dtype=jnp.float32), start)
    _, idxs = jax.lax.scan(step, init, None, length=npoint)
    return idxs.transpose(1, 0)  # [B, npoint]


def fps_from_given(
    npoint: int,
    points: jax.Array,
    given_idx: jax.Array,
    given_count: jax.Array,
    *,
    use_pallas: bool | None = None,
) -> jax.Array:
    """FPS completion from a given (possibly shorter) prefix of indices.

    Equivalent to sputils._fps_from_given_pc: the first `given_count[b]`
    outputs are `given_idx[b, :count]` verbatim; the remainder greedily adds
    the farthest point from the running selected set. Static shapes: the
    prefix buffer is [B, npoint] with only the first `given_count` entries
    meaningful.

    Args:
      npoint: total outputs (static).
      points: [B, N, C].
      given_idx: [B, npoint] int32, prefix indices compacted to the front.
      given_count: [B] int32, number of valid prefix entries (>=1).

    Returns:
      [B, npoint] int32 selected indices.
    """
    points = jnp.asarray(points)
    if use_pallas is None:
        use_pallas = _pallas_fps_available(points)
    if use_pallas:
        from samplenet_tpu.ops.pallas.fps_kernel import fps_from_given_pallas

        return fps_from_given_pallas(
            npoint, points, jnp.asarray(given_idx, jnp.int32),
            jnp.asarray(given_count, jnp.int32))
    b, n, _ = points.shape
    given_idx = jnp.asarray(given_idx, dtype=jnp.int32)
    given_count = jnp.asarray(given_count, dtype=jnp.int32)

    def step(carry, t):
        dist = carry
        far = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        use_given = t < given_count
        sel = jnp.where(use_given, given_idx[:, t], far)
        sel_xyz = jnp.take_along_axis(points, sel[:, None, None], axis=1)[:, 0]
        dist = jnp.minimum(dist, _sqdist_to(points, sel_xyz))
        return dist, sel

    init = jnp.full((b, n), jnp.inf, dtype=jnp.float32)
    _, idxs = jax.lax.scan(step, init, jnp.arange(npoint, dtype=jnp.int32))
    return idxs.transpose(1, 0)


def farthest_point_sample_with_points(
    npoint: int,
    points: jax.Array,
    *,
    start_idx: jax.Array | int = 0,
    use_pallas: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """`farthest_point_sample` returning (idx [B, npoint], xyz [B, npoint, 3]).

    On TPU the Pallas kernel emits the selected coordinates bit-exactly
    from its in-kernel one-hot select, replacing the serialized row gather
    in the fps+gather_point idiom (AE FPS-sorted output pointnet_ae.py:69-76,
    FPS baseline samplers fps.py:8-43); elsewhere this is FPS + gather."""
    points = jnp.asarray(points)
    if use_pallas is None:
        use_pallas = _pallas_fps_available(points)
    if use_pallas:
        from samplenet_tpu.ops.pallas.fps_kernel import (
            farthest_point_sample_pallas_with_points,
        )

        idx, xyz = farthest_point_sample_pallas_with_points(
            npoint, points, start_idx=start_idx)
        # the kernel computes in f32; keep the output dtype backend-agnostic
        return idx, xyz.astype(points.dtype)
    idx = farthest_point_sample(npoint, points, start_idx=start_idx,
                                use_pallas=False)
    return idx, gather_point(points, idx)


def fps_from_given_with_points(
    npoint: int,
    points: jax.Array,
    given_idx: jax.Array,
    given_count: jax.Array,
    *,
    use_pallas: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """`fps_from_given` returning (idx [B, npoint], xyz [B, npoint, 3]).

    On TPU the Pallas kernel emits the selected coordinates from the
    one-hot select its distance update already computes (bit-exact, zero
    extra HBM traffic); elsewhere this is fps_from_given + gather_point.
    Every matching caller wants the points right after the indices
    (sputils.nn_matching's final gather), and the standalone row gather is
    a serialized while-loop on TPU (~9 ms at [B=1024, k=1024])."""
    points = jnp.asarray(points)
    if use_pallas is None:
        use_pallas = _pallas_fps_available(points)
    if use_pallas:
        from samplenet_tpu.ops.pallas.fps_kernel import (
            fps_from_given_pallas_with_points,
        )

        idx, xyz = fps_from_given_pallas_with_points(
            npoint, points, jnp.asarray(given_idx, jnp.int32),
            jnp.asarray(given_count, jnp.int32))
        # the kernel computes in f32; keep the output dtype backend-agnostic
        return idx, xyz.astype(points.dtype)
    idx = fps_from_given(npoint, points, given_idx, given_count,
                         use_pallas=False)
    return idx, gather_point(points, idx)


def prob_sample(key: jax.Array, weights: jax.Array, npoint: int) -> jax.Array:
    """Weighted multinomial index sampling (`ProbSample`,
    tf_sampling_g.cu:7-104 cumsum + binary search) — here jax.random.choice
    semantics via the Gumbel-free inverse-CDF on a cumulative sum.

    Args:
      key: PRNG key.
      weights: [B, N] non-negative sampling weights.
      npoint: number of samples (with replacement).

    Returns:
      [B, npoint] int32 indices.
    """
    cdf = jnp.cumsum(weights, axis=-1)
    total = cdf[:, -1:]
    u = jax.random.uniform(key, (weights.shape[0], npoint)) * total
    idx = jnp.sum(cdf[:, None, :] < u[:, :, None], axis=-1)
    return jnp.clip(idx, 0, weights.shape[-1] - 1).astype(jnp.int32)


def non_sampled(ndataset: int, idx: jax.Array) -> jax.Array:
    """Complement of a sampled index set, per batch row
    (reconstruction/external/sampling/tf_sampling.py:79-108 semantics:
    for [B, npoint] unique indices into range(ndataset), return the
    [B, ndataset - npoint] indices NOT sampled, ascending)."""
    idx = jnp.asarray(idx, jnp.int32)
    b, npoint = idx.shape
    indicator = jnp.zeros((b, ndataset), jnp.int32)
    indicator = jax.vmap(lambda ind, i: ind.at[i].set(1))(indicator, idx)
    order = jax.lax.broadcasted_iota(jnp.int32, (b, ndataset), 1)
    # rank non-sampled first (stable ascending), take the complement count
    key = jnp.where(indicator == 0, order, order + ndataset)
    _, comp = jax.lax.top_k(-key, ndataset - npoint)
    return jnp.sort(comp.astype(jnp.int32), axis=1)
