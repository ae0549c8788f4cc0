"""Race formulations of the m>128 unique+compact path (ops/matching.py).

The progressive ordered infer (BASELINE config 3) and the m=1024 eval
forward (config 3b) spend most of their device time in
`first_occurrence_mask` + `_compact_indices` at [B=1024, m=1024]: the
round-4 profile attributes ~18 ms/step to sort/while ops from the three
[B, m] argsorts. Candidates raced here, all static-shape:

  occ: sort      — the r2-shipped path, INLINED here as a local function
                   (argsort + adjacent-compare + inverse scatter) since
                   round 4 rewrote ops.matching to the chunked/one-hot
                   formulations — importing from ops.matching would race
                   the new code against itself
  occ: chunked   — dense equality compare, chunked over rows (VPU
                   compare+any fused by XLA, no [B,m,m] buffer in HBM);
                   shipped since r4 (ops.matching.first_occurrence_mask)
  compact: sort  — r2-shipped path, inlined (stable argsort of pos)
  compact: onehot— one-hot matmul chunked over output slots (MXU; the
                   unchunked [B,m,k] one-hot would be 4 GB — chunks are
                   [B,m,128] operand tiles); shipped since r4

Reference semantics: sputils._unique + nn_matching front-packing
(registration/src/sputils.py). Prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

from samplenet_tpu.ops.matching import (
    _compact_indices,
    first_occurrence_mask,
)


def occ_sort(idx: jax.Array) -> jax.Array:
    """The r2-shipped first-occurrence mask, inlined as the race baseline:
    stable argsort groups equal values (first occurrence first), an
    adjacent compare marks group heads, and the inverse permutation
    scatters the mask back to input order. Three [B, m] sorts — each a
    serialized while-loop on TPU."""
    b, m = idx.shape
    order = jnp.argsort(idx, axis=1, stable=True)
    sv = jnp.take_along_axis(idx, order, axis=1)
    first = jnp.concatenate(
        [jnp.ones((b, 1), bool), sv[:, 1:] != sv[:, :-1]], axis=1)
    inv = jnp.argsort(order, axis=1)
    return jnp.take_along_axis(first, inv, axis=1)


def compact_sort(idx: jax.Array, occ: jax.Array, k: int) -> jax.Array:
    """The r2-shipped front-packing, inlined as the race baseline: stable
    argsort of the running first-occurrence position (dropped entries
    keyed past the end) pulls unique values to the front in order."""
    m = idx.shape[1]
    pos = jnp.where(occ, jnp.cumsum(occ, axis=1) - 1, m)
    order = jnp.argsort(pos, axis=1, stable=True)
    return jnp.take_along_axis(idx, order, axis=1)[:, :k]


def occ_chunked(idx: jax.Array, chunk: int = 128) -> jax.Array:
    """occ via dense compare, chunked over the i axis: dup_before[b, i] =
    any_{j<i} idx[b, j] == idx[b, i]. XLA fuses compare+mask+any per chunk
    so HBM never sees a [B, m, m] buffer."""
    b, m = idx.shape
    outs = []
    jpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
    for i0 in range(0, m, chunk):
        c = min(chunk, m - i0)  # clamp the tail block (matches ops.matching)
        blk = jax.lax.dynamic_slice_in_dim(idx, i0, c, axis=1)
        eq = blk[:, :, None] == idx[:, None, :]          # [B, c, m]
        ipos = i0 + jax.lax.broadcasted_iota(jnp.int32, (1, c, 1), 1)
        outs.append(~jnp.any(eq & (jpos < ipos), axis=2))
    return jnp.concatenate(outs, axis=1)


def compact_onehot(idx: jax.Array, occ: jax.Array, k: int,
                   chunk: int = 128) -> jax.Array:
    """Front-pack first occurrences with chunked one-hot matmuls (MXU).
    compact[b, j] = sum_i [pos(b, i) == j] * idx(b, i); pos is the running
    first-occurrence count, dropped entries keyed past the end."""
    m = idx.shape[1]
    pos = jnp.cumsum(occ, axis=1) - 1
    pos = jnp.where(occ, pos, m)
    idxf = idx.astype(jnp.float32)
    outs = []
    for k0 in range(0, k, chunk):
        c = min(chunk, k - k0)
        slots = k0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2)
        oh = (pos[:, :, None] == slots).astype(jnp.float32)   # [B, m, c]
        outs.append(jnp.einsum("bmc,bm->bc", oh, idxf,
                               preferred_element_type=jnp.float32))
    return jnp.concatenate(outs, axis=1).astype(jnp.int32)


def gather_onehot(points: jax.Array, idx: jax.Array,
                  chunk: int = 128) -> jax.Array:
    """gather_point as chunked one-hot matmuls: out[b, j] =
    sum_n [idx(b, j) == n] * points[b, n]. Races the take_along_axis row
    gather, which XLA may lower to a serialized loop at [B=1024, k=1024]."""
    n = points.shape[1]
    k = idx.shape[1]
    outs = []
    slots = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    for k0 in range(0, k, chunk):
        c = min(chunk, k - k0)
        blk = idx[:, k0:k0 + c]
        oh = (blk[:, :, None] == slots).astype(jnp.float32)    # [B, c, N]
        outs.append(jnp.einsum("bcn,bnd->bcd", oh, points,
                               preferred_element_type=jnp.float32))
    return jnp.concatenate(outs, axis=1)


def main() -> None:
    from samplenet_tpu.utils.jax_setup import setup

    setup()
    sys.path.insert(0, "benchmarks")
    from measure import pipelined_rate

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--m", type=int, default=1024)
    p.add_argument("--n", type=int, default=1024)
    args = p.parse_args()
    b, m, n = args.batch, args.m, args.n

    rng = np.random.RandomState(0)
    idx_host = rng.randint(0, n, size=(b, m)).astype(np.int32)
    idx = jnp.asarray(idx_host)

    variants = {
        "occ_sort+compact_sort": jax.jit(
            lambda i: compact_sort(i, occ_sort(i), m)),
        "occ_chunk+compact_sort": jax.jit(
            lambda i: compact_sort(i, occ_chunked(i), m)),
        "occ_chunk+compact_onehot": jax.jit(
            lambda i: compact_onehot(i, occ_chunked(i), m)),
        "occ_sort+compact_onehot": jax.jit(
            lambda i: compact_onehot(i, occ_sort(i), m)),
        # the shipped ops.matching path (r4: chunked compare + one-hot
        # matmul) for cross-round continuity
        "shipped_r4": jax.jit(
            lambda i: _compact_indices(i, first_occurrence_mask(i), m)),
    }

    ref = np.asarray(variants["occ_sort+compact_sort"](idx))
    counts = np.array([len(dict.fromkeys(row)) for row in idx_host])
    for name, fn in variants.items():
        got = np.asarray(fn(idx))
        # dropped tail slots differ by construction; compare the packed
        # prefix per row (count = number of unique values)
        ok = all(np.array_equal(got[r, :c], ref[r, :c])
                 for r, c in enumerate(counts))
        res = pipelined_rate(fn, [(idx,)], b, min_iters=32)
        print(json.dumps({
            "variant": name, "match_prefix": bool(ok),
            "ms_per_call": round(1000.0 * b / res["rate"], 3),
            "clouds_per_sec": round(res["rate"], 1),
            "spread": res["spread"],
        }), flush=True)

    # gather_point race at the same shape (the final [B, k] row gather)
    from samplenet_tpu.ops.fps import gather_point

    pts = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    gvars = {
        "gather_take_along_axis": jax.jit(gather_point),
        "gather_onehot_matmul": jax.jit(gather_onehot),
    }
    gref = np.asarray(gvars["gather_take_along_axis"](pts, idx))
    for name, fn in gvars.items():
        got = np.asarray(fn(pts, idx))
        res = pipelined_rate(fn, [(pts, idx)], b, min_iters=32)
        print(json.dumps({
            "variant": name,
            "match": bool(np.allclose(got, gref)),
            "ms_per_call": round(1000.0 * b / res["rate"], 3),
            "clouds_per_sec": round(res["rate"], 1),
            "spread": res["spread"],
        }), flush=True)


if __name__ == "__main__":
    main()
