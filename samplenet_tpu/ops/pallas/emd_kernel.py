"""Blocked approximate-EMD (auction matching) Pallas kernel.

The XLA formulation of `approx_match` materialises the [B, n, m] weight
tensor in HBM several times per temperature level (11 levels). This kernel
runs the ENTIRE level schedule for one cloud pair per grid step with the
match accumulator resident in VMEM and the distance tile recomputed from the
raw coordinates on the fly — HBM sees the coordinates once and the final
match once.

Per level, two passes over row tiles (the column-capacity ratio needs the
full column sums of the row-normalised weights before they can be applied):
  pass 1: w = exp(level*d2)*satr; row-normalise against satl; accumulate
          column sums (row sums are cached for pass 2);
  pass 2: rebuild w from the cached row sums, apply the column ratio,
          accumulate into match, update both saturation vectors.

Capacity: match [n, m] + one [TN, m] working tile must fit VMEM, so
n*m <= ~1024^2 in f32 (use `approx_match(..., fast_math=True)` or the XLA
path above that).

MEASURED RESULT (round 1, v5e, B=8 1024x1024): 2.38 ms vs XLA f32 2.95 ms
and XLA fast_math 2.45 ms — parity with the bf16 XLA path (the op is
compute-bound on the exp recomputation; XLA's own fusion already avoids
most of the HBM traffic this kernel eliminates). Default paths stay XLA;
kept as infrastructure. Transport cost agrees with XLA f32 to 4e-4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEVELS = tuple(-(4.0 ** j) for j in range(8, -2, -1)) + (0.0,)


def _emd_kernel(x1_ref, x2_ref, match_ref, rs_ref, satl_ref, *, n, m,
                tile_n, factorl, factorr):
    """x1 [1,3,n], x2 [1,3,m] -> match [1,n,m]; rs/satl: VMEM [1,n] scratch
    (Mosaic cannot concatenate 1-D vectors, so the row-saturation state lives
    in a scratch ref updated slice-by-slice)."""
    num_tiles = n // tile_n
    x2x = x2_ref[0, 0, :][None, :]   # [1, m]
    x2y = x2_ref[0, 1, :][None, :]
    x2z = x2_ref[0, 2, :][None, :]

    match_ref[0] = jnp.zeros((n, m), match_ref.dtype)

    def d2_tile(t):
        lo, hi = t * tile_n, (t + 1) * tile_n
        x1x = x1_ref[0, 0, lo:hi][:, None]  # [TN, 1]
        x1y = x1_ref[0, 1, lo:hi][:, None]
        x1z = x1_ref[0, 2, lo:hi][:, None]
        return (x1x - x2x) ** 2 + (x1y - x2y) ** 2 + (x1z - x2z) ** 2

    satl_ref[0, :] = jnp.full((n,), factorl, jnp.float32)
    satr = jnp.full((1, m), factorr, jnp.float32)

    for level in LEVELS:
        # pass 1: row sums + column sums of row-normalised weights
        colsum = jnp.full((1, m), 1e-9, jnp.float32)
        for t in range(num_tiles):
            lo, hi = t * tile_n, (t + 1) * tile_n
            w = jnp.exp(level * d2_tile(t)) * satr           # [TN, m]
            rs = 1e-9 + jnp.sum(w, axis=1)                   # [TN]
            rs_ref[0, lo:hi] = rs
            satl_t = satl_ref[0, lo:hi]
            w = w / rs[:, None] * satl_t[:, None]
            colsum = colsum + jnp.sum(w, axis=0)[None, :]
        ratio = jnp.minimum(satr / colsum, 1.0)              # [1, m]

        # pass 2: apply ratio, accumulate match, update saturations
        colsum2 = jnp.zeros((1, m), jnp.float32)
        for t in range(num_tiles):
            lo, hi = t * tile_n, (t + 1) * tile_n
            rs = rs_ref[0, lo:hi]
            satl_t = satl_ref[0, lo:hi]
            w = (jnp.exp(level * d2_tile(t)) * satr
                 / rs[:, None] * satl_t[:, None]) * ratio
            match_ref[0, lo:hi, :] = match_ref[0, lo:hi, :] + w.astype(
                match_ref.dtype)
            satl_ref[0, lo:hi] = jnp.maximum(
                satl_t - jnp.sum(w, axis=1), 0.0)
            colsum2 = colsum2 + jnp.sum(w, axis=0)[None, :]
        satr = jnp.maximum(satr - colsum2, 0.0)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def approx_match_pallas(
    xyz1: jax.Array,   # [B, n, 3]
    xyz2: jax.Array,   # [B, m, 3]
    *,
    tile_n: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused approx_match. Returns [B, n, m] f32 (non-differentiable)."""
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    tn = min(tile_n, n)
    if n % tn:
        raise ValueError(f"n={n} must be divisible by tile_n={tn}")
    factorl = float(max(n, m) // n)
    factorr = float(max(n, m) // m)

    x1t = jnp.swapaxes(xyz1, 1, 2).astype(jnp.float32)
    x2t = jnp.swapaxes(xyz2, 1, 2).astype(jnp.float32)

    kernel = functools.partial(
        _emd_kernel, n=n, m=m, tile_n=tn, factorl=factorl, factorr=factorr)
    match = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, m), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32),
                        pltpu.VMEM((1, n), jnp.float32)],
        interpret=interpret,
    )(x1t, x2t)
    return jax.lax.stop_gradient(match)
