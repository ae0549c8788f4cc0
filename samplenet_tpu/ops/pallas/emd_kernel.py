"""Fused approx-EMD transport-cost Pallas kernel (cost + analytic grads).

The reference `ApproxMatch`/`MatchCost` pair (classification/
structural_losses/tf_approxmatch.cpp:23-105, GPU tf_approxmatch_g.cu:11-35)
runs an 11-level auction schedule whose GPU kernel keeps 1024-point tiles
in shared memory across the inner loops. The XLA `lax.scan` formulation
(ops/matching.py) is semantically identical but round-trips three
[B, n, m] buffers through HBM per level — ~44 GB of traffic at the
reference AE config (B=50, 2048x2048), which is the whole cost of the op.

This kernel is the TPU-first analogue of the reference's shared-memory
tiling, taken one step further: the consumer of `approx_match` in every
training path is `match_cost` (the match matrix itself is no-grad and is
reduced immediately), so the kernel fuses the match construction into the
cost reduction and NEVER materialises [n, m] anywhere — not even in VMEM.
Per level it recomputes the distance tile [nt, m] from the raw coordinates
(two broadcast-difference passes; the coordinates are 24 KB and live in
VMEM for the whole cell), so HBM sees exactly the [n, 3] + [m, 3] inputs
and the [B] + gradient outputs. Cross-tile state is only the row/col
saturation vectors, as in the reference kernel.

Because `MatchCostGrad` is a closed form in the match weights
(match[i,j] * (x1[i] - x2[j]) / d[i,j], tf_approxmatch_g.cu:229-292), the
same level pass also accumulates both gradients on the fly, giving a
custom_vjp whose backward is two broadcasts — the [B, n, m] match matrix
never exists in the autodiff graph either.

Numerics: all bookkeeping (saturations, row/col sums, cost, grads) is f32;
padding rows/columns carry zero saturation so they receive zero transport
mass exactly (no epsilon contamination). A `fast_math` flag is deliberately
ABSENT: the XLA path's bf16 fast_math wins by halving HBM level traffic,
which this kernel does not have; in-kernel VPU elementwise math runs at
f32 rate regardless of storage dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samplenet_tpu.ops.pallas.partitioning import batch_partition

# The reference level schedule: -4^j for j = 8..-1, then 0
# (tf_approxmatch.cpp:29-33 `factor = -powf(4.0, j)` loop).
_LEVELS = tuple(-(4.0 ** j) for j in range(8, -2, -1)) + (0.0,)


def _emd_kernel(
    x1t_ref,   # VMEM (1, 8*n_tiles, nt) f32: tile i rows [8i, 8i+3) = x/y/z
    x2_ref,    # VMEM (1, 3, m_pad) f32
    cost_ref,  # VMEM (1, 1, 128) f32 out (cost broadcast over lanes)
    g1t_ref,   # VMEM (1, 8*n_tiles, nt) f32 out, same tile layout as x1t
    g2_ref,    # VMEM (1, 3, m_pad) f32 out
    satl_ref,  # VMEM (8*n_tiles, nt) f32 scratch: tile i's row saturations
    *,
    n: int,
    m: int,
    n_pad: int,
    m_pad: int,
    nt: int,
    with_grads: bool,
):
    # Mosaic lowering constraints shape this kernel (CLAUDE.md quirks):
    # no dynamic_slice on loop-carried VALUES (only pl.dslice on refs), no
    # scalar extraction / axis squeezes (they lower as gathers), and a
    # fully static tile unroll keeps every tile's [nt, m_pad] intermediates
    # live at once (~50 MB at 2048^2 — scoped-VMEM OOM). So: the tile loops
    # are fori_loops, per-tile row saturations live in a VMEM scratch
    # indexed by 8-aligned pl.dslice (tiles stride 8 sublanes — dynamic
    # sublane offsets must be 8-aligned), g1 accumulates directly into its
    # (8-row-per-tile) output ref, and all row/column state is 1-D lane
    # vectors in chamfer_kernel's proven idioms ([:, None] columns, 1-D
    # stores into lane slices).
    n_tiles = n_pad // nt

    x2 = x2_ref[0]                   # [3, m_pad]
    p2 = [x2[ax, :] for ax in range(3)]              # 1-D [m_pad]

    # integer-division factors per the reference spec
    # (tf_approxmatch.cpp:25-26 `int factorl=std::max(n,m)/n`)
    factorl = float(max(n, m) // n)
    factorr = float(max(n, m) // m)
    col_pos = jax.lax.iota(jnp.int32, m_pad)
    # zero saturation on padded rows/columns => exactly zero transport mass
    satr = jnp.where(col_pos < m, factorr, 0.0).astype(jnp.float32)
    for i in range(n_tiles):         # static init (n_tiles stores)
        tile_pos = jax.lax.broadcasted_iota(jnp.int32, (8, nt), 1) + i * nt
        satl_ref[8 * i : 8 * (i + 1), :] = jnp.where(
            tile_pos < n, factorl, 0.0).astype(jnp.float32)
    g1t_ref[0, :, :] = jnp.zeros((8 * n_tiles, nt), jnp.float32)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, nt), 0)

    def tile_block(i):
        """Tile i of x1 as an [8, nt] block (rows 0-2 = x/y/z)."""
        return x1t_ref[0, pl.dslice(8 * i, 8), :]

    def level_weights(i, level, satr):
        """Row-normalised pre-ratio weights for row tile i (recomputed in
        both passes — cheaper than holding [n, m] in VMEM)."""
        blk = tile_block(i)
        satl_i = satl_ref[pl.dslice(8 * i, 8), :][0, :]   # 1-D [nt]
        d2 = jnp.zeros((nt, m_pad), jnp.float32)
        for ax in range(3):
            diff = blk[ax, :][:, None] - p2[ax][None, :]
            d2 = d2 + diff * diff
        weight = jnp.exp(level * d2) * satr[None, :]  # [nt, m_pad]
        rowsum = 1e-9 + jnp.sum(weight, axis=1)       # 1-D [nt]
        return d2, weight * (satl_i / rowsum)[:, None]

    cost = jnp.float32(0.0)
    g2 = [jnp.zeros((m_pad,), jnp.float32) for _ in range(3)]

    # Pass A of level 0 (the only standalone A pass: every later level's
    # column sums are computed fused into the previous level's pass B,
    # reusing that pass's distance tile — saves one full d2+exp recompute
    # per level, ~15-20% of the kernel).
    def pass_a0(i, colsum, level=_LEVELS[0], satr=satr):
        _, w = level_weights(i, level, satr)
        return colsum + jnp.sum(w, axis=0)

    colsum = jax.lax.fori_loop(
        0, n_tiles, pass_a0, jnp.zeros((m_pad,), jnp.float32))

    for li, level in enumerate(_LEVELS):              # static unroll (11)
        ratio = jnp.minimum(satr / (1e-9 + colsum), 1.0)
        # satr for level li+1 depends only on this level's colsum/ratio, so
        # it is known BEFORE pass B — which is what lets B(l) also compute
        # A(l+1): tile i's updated satl is produced in the same iteration.
        satr_next = jnp.maximum(satr - colsum * ratio, 0.0)
        next_level = _LEVELS[li + 1] if li + 1 < len(_LEVELS) else None

        # Pass B: apply the ratio, fold this level's mass into the cost
        # (and gradients), decrement the row saturations, and accumulate
        # the NEXT level's column sums from the same distance tile.
        def pass_b(i, acc, level=level, satr=satr, ratio=ratio,
                   satr_next=satr_next, next_level=next_level):
            cost, g2x, g2y, g2z, colsum_next = acc
            d2, w = level_weights(i, level, satr)
            wr = w * ratio[None, :]                   # final level weights
            new0 = jnp.maximum(
                satl_ref[pl.dslice(8 * i, 8), :][0, :] - jnp.sum(wr, axis=1),
                0.0)
            satl_ref[pl.dslice(8 * i, 8), :] = jnp.broadcast_to(
                new0[None, :], (8, nt))
            d = jnp.maximum(jnp.sqrt(jnp.maximum(d2, 0.0)), 1e-20)
            cost = cost + jnp.sum(wr * d)
            if with_grads:
                # MatchCostGrad closed form: match * (x1 - x2) / d per pair
                # (tf_approxmatch_g.cu:229-292), accumulated level by level.
                u = wr / d                            # [nt, m_pad]
                ru = jnp.sum(u, axis=1)               # 1-D [nt]
                cu = jnp.sum(u, axis=0)               # 1-D [m_pad]
                blk = tile_block(i)
                dr = [blk[c, :] * ru
                      - jnp.sum(u * p2[c][None, :], axis=1) for c in range(3)]
                d8 = (jnp.where(sub8 == 0, dr[0][None, :], 0.0)
                      + jnp.where(sub8 == 1, dr[1][None, :], 0.0)
                      + jnp.where(sub8 == 2, dr[2][None, :], 0.0))
                g1t_ref[0, pl.dslice(8 * i, 8), :] = (
                    g1t_ref[0, pl.dslice(8 * i, 8), :] + d8)
                g2c = [p2[c] * cu - jnp.sum(u * blk[c, :][:, None], axis=0)
                       for c in range(3)]
                g2x, g2y, g2z = g2x + g2c[0], g2y + g2c[1], g2z + g2c[2]
            if next_level is not None:                # fused A(l+1)
                weight2 = jnp.exp(next_level * d2) * satr_next[None, :]
                rowsum2 = 1e-9 + jnp.sum(weight2, axis=1)
                w2 = weight2 * (new0 / rowsum2)[:, None]
                colsum_next = colsum_next + jnp.sum(w2, axis=0)
            return cost, g2x, g2y, g2z, colsum_next

        cost, g2x, g2y, g2z, colsum = jax.lax.fori_loop(
            0, n_tiles, pass_b,
            (cost, g2[0], g2[1], g2[2], jnp.zeros((m_pad,), jnp.float32)))
        g2 = [g2x, g2y, g2z]
        satr = satr_next

    cost_ref[0, 0, :] = jnp.broadcast_to(cost, (128,))
    for c in range(3):
        g2_ref[0, c, :] = g2[c]


def _auto_nt(n_pad: int, m_pad: int) -> int:
    """Row-tile height: ~8 live [nt, m_pad] f32 intermediates under ~8 MB.
    Floor 128 so the static row-tile slices stay lane-aligned (x1 is laid
    out [3, n_pad] with rows in the lane dim)."""
    nt = 256
    while nt > 128 and 8 * nt * m_pad * 4 > 8 * 2 ** 20:
        nt //= 2
    return min(nt, n_pad)


def _pad_to(x: jax.Array, dim_to: int) -> jax.Array:
    pad = dim_to - x.shape[-1]
    if pad:
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    return x


def _run_impl(xyz1, xyz2, with_grads, interpret):
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    n_pad = max(128, -(-n // 128) * 128)
    m_pad = max(128, -(-m // 128) * 128)
    nt = _auto_nt(n_pad, m_pad)
    while n_pad % nt:
        nt //= 2
    n_tiles = n_pad // nt
    x1 = _pad_to(jnp.swapaxes(xyz1.astype(jnp.float32), 1, 2), n_pad)
    x2 = _pad_to(jnp.swapaxes(xyz2.astype(jnp.float32), 1, 2), m_pad)
    # tile-major 8-row layout: [B, 3, n_pad] -> [B, 8*n_tiles, nt] with
    # tile i's x/y/z at rows [8i, 8i+3) — dynamic sublane offsets inside
    # the kernel must be 8-aligned, so each tile owns a full 8-row group
    # (the 5 spare rows are zeros; XLA does this transpose outside).
    x1t = jnp.transpose(x1.reshape(b, 3, n_tiles, nt), (0, 2, 1, 3))
    x1t = jnp.pad(x1t, ((0, 0), (0, 0), (0, 5), (0, 0)))
    x1t = x1t.reshape(b, 8 * n_tiles, nt)

    kernel = functools.partial(
        _emd_kernel, n=n, m=m, n_pad=n_pad, m_pad=m_pad, nt=nt,
        with_grads=with_grads)
    cost, g1t, g2 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 8 * n_tiles, nt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * n_tiles, nt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 8 * n_tiles, nt), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, m_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8 * n_tiles, nt), jnp.float32)],
        interpret=interpret,
    )(x1t, x2)
    g1 = jnp.transpose(
        g1t.reshape(b, n_tiles, 8, nt)[:, :, :3, :], (0, 2, 1, 3)
    ).reshape(b, 3, n_pad)
    g1 = jnp.swapaxes(g1, 1, 2)[:, :n]
    g2 = jnp.swapaxes(g2, 1, 2)[:, :m]
    return cost[:, 0, 0], g1, g2


# SPMD: batch-shard all operands/outputs on dim 0 (grid iterates B; nothing
# crosses batch elements) — a batch-sharded AE train step runs the kernel
# collective-free on each device's shard.
_run = batch_partition(
    _run_impl,
    rule="b n c, b m c -> b, b n c, b m c",
    static_argnums=(2, 3),
)


@functools.partial(jax.jit, static_argnames=("with_grads", "interpret"))
def emd_cost_pallas(
    xyz1: jax.Array,
    xyz2: jax.Array,
    *,
    with_grads: bool = True,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused approx-EMD transport cost.

    Args:
      xyz1: [B, n, 3]; xyz2: [B, m, 3].
      with_grads: also accumulate the analytic MatchCost gradients
        (d cost / d xyz1, d cost / d xyz2 with the match frozen — the
        reference MatchCostGrad semantics). When False the gradient
        outputs are zeros and the kernel does ~40% less VPU work.

    Returns:
      (cost [B], grad1 [B, n, 3], grad2 [B, m, 3]) — cost equals
      match_cost(xyz1, xyz2, approx_match(xyz1, xyz2)) up to f32
      reassociation.
    """
    return _run(jnp.asarray(xyz1), jnp.asarray(xyz2), with_grads, interpret)
