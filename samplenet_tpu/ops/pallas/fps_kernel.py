"""Batched farthest-point-sampling Pallas kernel.

The XLA `lax.scan` FPS (ops/fps.py) costs ~68 us per step at [1024, 1024] —
roughly 2x the bandwidth bound, because each step re-streams the point
coordinates and the distance buffer through HBM. This kernel keeps points,
the running min-distance buffer, and the selection list VMEM-resident for a
whole batch block and runs all m steps in one `fori_loop`, so HBM sees each
input exactly once.

Supports the seeded-prefix variant (sputils._fps_from_given_pc semantics)
used by the inference matching path: for t < count[b] the selection is
given_idx[b, t] instead of the argmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samplenet_tpu.ops.pallas.partitioning import batch_partition


def _fps_kernel(
    pts_ref,    # VMEM (BB, 3, N)
    given_ref,  # VMEM (BB, M) int32 prefix indices (compacted)
    count_ref,  # VMEM (BB, 1) int32 number of valid prefix entries
    idx_ref,    # VMEM (BB, M) int32 output
    *out_refs,  # optional xyz_ref VMEM (BB, 3, M) when emit_xyz
    npoint: int,
    n: int,
    emit_xyz: bool,
):
    # The plain (unseeded) variant is the seeded one with count == 1 and
    # given[:, 0] = start index, so there is exactly one code path here.
    bb = pts_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (bb, n), 1)
    col_m = jax.lax.broadcasted_iota(jnp.int32, (bb, npoint), 1)
    px = pts_ref[:, 0, :]
    py = pts_ref[:, 1, :]
    pz = pts_ref[:, 2, :]
    count = count_ref[:, 0]

    def body(t, carry):
        dist, selvec, xyzvec = carry
        far = jnp.argmax(dist, axis=1).astype(jnp.int32)      # [BB]
        gsel = jnp.sum(
            jnp.where(col_m == t, given_ref[:, :], 0), axis=1
        ).astype(jnp.int32)
        sel = jnp.where(t < count, gsel, far)
        onehot = (col == sel[:, None]).astype(jnp.float32)    # [BB, N]
        sx = jnp.sum(onehot * px, axis=1)[:, None]            # [BB, 1]
        sy = jnp.sum(onehot * py, axis=1)[:, None]
        sz = jnp.sum(onehot * pz, axis=1)[:, None]
        d = (px - sx) ** 2 + (py - sy) ** 2 + (pz - sz) ** 2
        dist = jnp.minimum(dist, d)
        selvec = jnp.where(col_m == t, sel[:, None], selvec)
        if emit_xyz:
            # sx/sy/sz are the selected point's coordinates, bit-exact
            # (one-hot f32 multiply-sum: one nonzero term, zeros add
            # exactly) — recording them here makes the downstream
            # gather_point free. At [B=1024, k=1024] that row gather is
            # a ~9 ms serialized while-loop in XLA (the progressive
            # profile's `while.2`); three extra [BB, M] selects per step
            # are noise next to the [BB, N] distance update.
            xyzvec = (
                jnp.where(col_m == t, sx, xyzvec[0]),
                jnp.where(col_m == t, sy, xyzvec[1]),
                jnp.where(col_m == t, sz, xyzvec[2]),
            )
        return dist, selvec, xyzvec

    init = (
        jnp.full((bb, n), jnp.inf, jnp.float32),
        jnp.zeros((bb, npoint), jnp.int32),
        tuple(jnp.zeros((bb, npoint), jnp.float32) for _ in range(3))
        if emit_xyz else (),
    )
    _, selvec, xyzvec = jax.lax.fori_loop(0, npoint, body, init)
    idx_ref[:, :] = selvec
    if emit_xyz:
        xyz_ref = out_refs[0]
        xyz_ref[:, 0, :] = xyzvec[0]
        xyz_ref[:, 1, :] = xyzvec[1]
        xyz_ref[:, 2, :] = xyzvec[2]


def _auto_block_b(b: int, n: int, npoint: int, emit_xyz: bool,
                  requested: int) -> int:
    """Halve the batch block until the VMEM working set fits ~12 MB.
    Per-row f32/int32 words: points 3n + dist n + onehot transient n,
    given/selvec/idx 3*npoint, and with emit_xyz three coordinate carries
    plus the [3, npoint] output (6*npoint)."""
    bb = min(requested, b)
    words = 5 * n + 3 * npoint + (6 * npoint if emit_xyz else 0)
    while bb > 8 and bb * words * 4 > 12 * 2**20:
        bb //= 2
    return bb


def _run_shared(points, given_idx, given_count, npoint, block_b, interpret,
                emit_xyz):
    points = jnp.asarray(points, jnp.float32)
    b, n, _ = points.shape
    bb = _auto_block_b(b, n, npoint, emit_xyz, block_b)
    pad_b = (-b) % bb
    pts_t = jnp.swapaxes(points, 1, 2)  # [B, 3, N]
    if pad_b:
        pts_t = jnp.pad(pts_t, ((0, pad_b), (0, 0), (0, 0)))
        given_idx = jnp.pad(given_idx, ((0, pad_b), (0, 0)))
        given_count = jnp.pad(given_count, ((0, pad_b),))
    bp = b + pad_b

    kernel = functools.partial(_fps_kernel, npoint=npoint, n=n,
                               emit_xyz=emit_xyz)
    out_specs = [pl.BlockSpec((bb, npoint), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((bp, npoint), jnp.int32)]
    if emit_xyz:
        out_specs.append(pl.BlockSpec((bb, 3, npoint), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((bp, 3, npoint), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(bp // bb,),
        in_specs=[
            pl.BlockSpec((bb, 3, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, npoint), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(pts_t, given_idx.astype(jnp.int32),
      given_count.astype(jnp.int32)[:, None])
    if emit_xyz:
        return out[0][:b], out[1][:b]
    return out[0][:b]


def _run_impl(points, given_idx, given_count, npoint, block_b, interpret):
    return _run_shared(points, given_idx, given_count, npoint, block_b,
                       interpret, False)


def _run_impl_xyz(points, given_idx, given_count, npoint, block_b, interpret):
    return _run_shared(points, given_idx, given_count, npoint, block_b,
                       interpret, True)


# SPMD: batch-shard dim 0 of (points, given_idx, given_count), replicate
# the point/prefix axes, run the kernel on each device's batch shard —
# both entry points below inherit multi-chip execution by construction.
_run = batch_partition(
    _run_impl,
    rule="b n c, b k, b -> b k",
    static_argnums=(3, 4, 5),
)

_run_xyz = batch_partition(
    _run_impl_xyz,
    rule="b n c, b k, b -> b k, b c k",
    static_argnums=(3, 4, 5),
)


@functools.partial(jax.jit, static_argnames=("npoint", "block_b", "interpret"))
def farthest_point_sample_pallas(
    npoint: int,
    points: jax.Array,
    *,
    start_idx: jax.Array | int = 0,
    block_b: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Pallas FPS with ops.fps.farthest_point_sample semantics."""
    b = points.shape[0]
    if isinstance(start_idx, int):
        start = jnp.full((b,), start_idx, jnp.int32)
    else:
        start = jnp.asarray(start_idx, jnp.int32)
    given = jnp.zeros((b, npoint), jnp.int32).at[:, 0].set(start)
    count = jnp.ones((b,), jnp.int32)
    return _run(points, given, count, npoint, block_b, interpret)


@functools.partial(jax.jit, static_argnames=("npoint", "block_b", "interpret"))
def farthest_point_sample_pallas_with_points(
    npoint: int,
    points: jax.Array,
    *,
    start_idx: jax.Array | int = 0,
    block_b: int = 128,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Plain FPS returning (idx, selected xyz) — the emit_xyz variant for
    the fps+gather_point idiom (AE sorted output, FPS baseline samplers)."""
    b = points.shape[0]
    if isinstance(start_idx, int):
        start = jnp.full((b,), start_idx, jnp.int32)
    else:
        start = jnp.asarray(start_idx, jnp.int32)
    given = jnp.zeros((b, npoint), jnp.int32).at[:, 0].set(start)
    count = jnp.ones((b,), jnp.int32)
    idx, xyz_t = _run_xyz(points, given, count, npoint, block_b, interpret)
    return idx, jnp.swapaxes(xyz_t, 1, 2)


@functools.partial(jax.jit, static_argnames=("npoint", "block_b", "interpret"))
def fps_from_given_pallas(
    npoint: int,
    points: jax.Array,
    given_idx: jax.Array,
    given_count: jax.Array,
    *,
    block_b: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Pallas seeded FPS with ops.fps.fps_from_given semantics."""
    return _run(points, given_idx, given_count, npoint, block_b, interpret)


@functools.partial(jax.jit, static_argnames=("npoint", "block_b", "interpret"))
def fps_from_given_pallas_with_points(
    npoint: int,
    points: jax.Array,
    given_idx: jax.Array,
    given_count: jax.Array,
    *,
    block_b: int = 128,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Seeded FPS that also returns the selected coordinates.

    Returns (idx [B, npoint] int32, xyz [B, npoint, 3] f32) with
    xyz[b, t] == points[b, idx[b, t]] bit-exactly — the in-kernel one-hot
    select the distance update needs anyway, recorded per step, replacing
    the serialized XLA row gather that follows FPS in every matching
    caller (sputils.nn_matching's final gather)."""
    idx, xyz_t = _run_xyz(points, given_idx, given_count, npoint, block_b,
                          interpret)
    return idx, jnp.swapaxes(xyz_t, 1, 2)
