"""Blockwise nn-distance (Chamfer) Pallas kernel.

One direction of nn_distance: for every point of X, the squared distance to
(and index of) its nearest neighbour in Y. The reference's CUDA kernel tiles
Y through shared memory in 512-point chunks with 4x unrolling
(classification/structural_losses/tf_nndistance_g.cu:5-100); here each
(batch, X-tile) grid cell streams Y through VMEM in lane-width chunks and
keeps the running (min, argmin) in registers — the [TX, N] distance tile
never exists in HBM.

Forward-only (used for eval/serving and inside stop-gradient index
computations); the training path keeps the differentiable XLA formulation in
ops/chamfer.py, which autodiffs to the same +-2g(x-y) gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samplenet_tpu.ops.pallas.partitioning import batch_partition


def _nn_direction_kernel(
    xt_ref,    # VMEM (BB, 3, N1): query points, channel-major
    yt_ref,    # VMEM (BB, 3, N2): database points, channel-major
    dist_ref,  # VMEM (BB, 1, N1)
    idx_ref,   # VMEM (BB, 1, N1)
    *out_refs,  # optional xyz_ref VMEM (BB, 3, N1) when emit_points
    n_queries: int,
    n_points: int,
    tile_x: int,
    chunk: int,
    emit_points: bool = False,
):
    # several clouds per grid cell (static unroll). KEEP THE UNROLL: a
    # batch-VECTORIZED body (carrying [BB, TX, CH] through the vector ops,
    # argmin via masked-iota min since Mosaic lowers 3D argmin through an
    # unsupported gather) was built and A/B-raced in round 5 — it LOST at
    # the eval matching shape (old bb=1 366 us vs vectorized best 403 us
    # at bb=8, B=1024 1024->32): 1-cloud grid cells already overlap across
    # the grid, and the 3D layouts + iota-argmin cost more than the
    # per-cell overhead they save. (nn_snap at B=32 1024->1024 gained 5%,
    # ~0.4% of the progressive step — not worth forking the body.)
    for bi in range(xt_ref.shape[0]):
        for t in range(n_queries // tile_x):
            x = xt_ref[bi, :, t * tile_x : (t + 1) * tile_x]  # [3, TX]
            best_d = jnp.full((tile_x,), jnp.inf, jnp.float32)
            best_i = jnp.zeros((tile_x,), jnp.int32)
            best_xyz = [jnp.zeros((tile_x,), jnp.float32) for _ in range(3)]
            for c in range(n_points // chunk):
                y = yt_ref[bi, :, c * chunk : (c + 1) * chunk]  # [3, CH]
                d2 = jnp.zeros((tile_x, chunk), jnp.float32)
                for ax in range(3):
                    diff = x[ax, :][:, None] - y[ax, :][None, :]
                    d2 = d2 + diff * diff
                c_min = jnp.min(d2, axis=1)
                c_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)
                take = c_min < best_d
                best_d = jnp.where(take, c_min, best_d)
                best_i = jnp.where(take, c_arg + c * chunk, best_i)
                if emit_points:
                    # the argmin's coordinates via an in-chunk one-hot
                    # select — bit-exact (one nonzero f32 term per sum),
                    # same trick as the FPS kernel's emit_xyz. Recording
                    # them here makes the snapped output gather-free.
                    cols = jax.lax.broadcasted_iota(
                        jnp.int32, (tile_x, chunk), 1)
                    onehot = (cols == c_arg[:, None]).astype(jnp.float32)
                    for ax in range(3):
                        sel = jnp.sum(onehot * y[ax, :][None, :], axis=1)
                        best_xyz[ax] = jnp.where(take, sel, best_xyz[ax])
            dist_ref[bi, 0, t * tile_x : (t + 1) * tile_x] = best_d
            idx_ref[bi, 0, t * tile_x : (t + 1) * tile_x] = best_i
            if emit_points:
                for ax in range(3):
                    out_refs[0][bi, ax, t * tile_x : (t + 1) * tile_x] = (
                        best_xyz[ax])


def _nn_run_shared(x, y, tile_x, chunk, block_b, interpret, emit_points):
    b, n1, _ = x.shape
    n2 = y.shape[1]
    tx = min(tile_x, n1)
    pad_x = (-n1) % tx
    ch = min(chunk, n2)
    pad_y = (-n2) % ch
    xt = jnp.swapaxes(x, 1, 2).astype(jnp.float32)      # [B, 3, N1]
    yt = jnp.swapaxes(y, 1, 2).astype(jnp.float32)      # [B, 3, N2]
    if pad_x:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, pad_x)))
    if pad_y:
        # pad database with +inf-distance sentinels (huge coordinates)
        yt = jnp.pad(yt, ((0, 0), (0, 0), (0, pad_y)),
                     constant_values=1e18)
    n1p, n2p = n1 + pad_x, n2 + pad_y

    # batch block kept at 1 by default: measured on v5e, 1-cloud grid cells
    # pipeline BETTER than multi-cloud blocks (329 us vs 446 us at bb=8 for
    # the m=32 eval matching shape — the unrolled per-element loop
    # serialises what independent cells overlap). Cap bb by the VMEM
    # footprint of the unrolled [tx, ch] distance tiles for callers that
    # do ask for blocking.
    bb = max(1, min(block_b,
                    (1 << 23) // max(tx * ch * 4, 1),
                    (1 << 22) // max(12 * (n1p + n2p), 1)))
    while b % bb:
        bb -= 1

    kernel = functools.partial(
        _nn_direction_kernel, n_queries=n1p, n_points=n2p, tile_x=tx,
        chunk=ch, emit_points=emit_points,
    )
    out_specs = [
        pl.BlockSpec((bb, 1, n1p), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, 1, n1p), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, 1, n1p), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, n1p), jnp.int32),
    ]
    if emit_points:
        out_specs.append(pl.BlockSpec((bb, 3, n1p), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, 3, n1p), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, 3, n1p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 3, n2p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(xt, yt)
    if emit_points:
        return out[0][:, 0, :n1], out[1][:, 0, :n1], out[2][:, :, :n1]
    return out[0][:, 0, :n1], out[1][:, 0, :n1]


def _nn_direction_impl(x, y, tile_x, chunk, block_b, interpret):
    return _nn_run_shared(x, y, tile_x, chunk, block_b, interpret, False)


def _nn_snap_impl(x, y, tile_x, chunk, block_b, interpret):
    return _nn_run_shared(x, y, tile_x, chunk, block_b, interpret, True)


# SPMD: shard dim 0 (batch), replicate the point axes, run per-shard —
# a batch-sharded caller keeps the kernel collective-free by construction.
_nn_direction_cp = batch_partition(
    _nn_direction_impl,
    rule="b n c, b m c -> b n, b n",
    static_argnums=(2, 3, 4, 5),
)

_nn_snap_cp = batch_partition(
    _nn_snap_impl,
    rule="b n c, b m c -> b n, b n, b c n",
    static_argnums=(2, 3, 4, 5),
)


@functools.partial(
    jax.jit, static_argnames=("tile_x", "chunk", "block_b", "interpret")
)
def nn_direction(
    x: jax.Array,  # [B, N1, 3] queries
    y: jax.Array,  # [B, N2, 3] database
    *,
    tile_x: int = 512,
    chunk: int = 512,
    block_b: int = 1,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(dist [B, N1], idx [B, N1]): NN of every x point in y."""
    return _nn_direction_cp(x, y, tile_x, chunk, block_b, interpret)


@functools.partial(
    jax.jit, static_argnames=("tile_x", "chunk", "block_b", "interpret")
)
def nn_snap(
    x: jax.Array,  # [B, N1, 3] queries
    y: jax.Array,  # [B, N2, 3] database
    *,
    tile_x: int = 512,
    chunk: int = 512,
    block_b: int = 1,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(dist [B, N1], idx [B, N1], snapped [B, N1, 3]): each query's nearest
    database point AND that point's coordinates, emitted in-kernel
    (bit-exact one-hot select) — the gather-free route for hard projection,
    where the XLA path's k-NN (chunked scan + top_k sorts) costs ~18 ms of
    a 38 ms progressive infer step at [B=32, 1024->1024] for an argmax
    that only ever needs the 1-NN."""
    dist, idx, snapped_t = _nn_snap_cp(x, y, tile_x, chunk, block_b,
                                       interpret)
    return dist, idx, jnp.swapaxes(snapped_t, 1, 2)


def nn_distance_pallas(
    xyz1: jax.Array, xyz2: jax.Array, *, interpret: bool = False
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Bidirectional NN distances (tf_nndistance contract), fused per side."""
    d1, i1 = nn_direction(xyz1, xyz2, interpret=interpret)
    d2, i2 = nn_direction(xyz2, xyz1, interpret=interpret)
    return d1, i1, d2, i2
