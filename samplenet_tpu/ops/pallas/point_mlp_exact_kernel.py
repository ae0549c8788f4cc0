"""Fused per-point-MLP training kernel with EXACT global BatchNorm.

`point_mlp_train_kernel.py` buys its single-pass VMEM structure by
changing BN semantics to per-block ghost statistics (measured ~1-2 pts
accuracy cost on the sampler task, BENCHMARKS.md). This kernel keeps the
EXACT flax/torch batch-global semantics — same loss, same gradients, same
EMA statistics as the XLA chain (up to matmul precision) — while still
never materialising a [B, N, C] activation in HBM:

  forward   = L small stats passes (pass l recomputes the chain to layer
              l-1 in VMEM using the already-final exact stats of earlier
              layers, then emits per-block (mean, mean-square) rows of
              z_l; the cross-block mean OUTSIDE the kernel yields the
              exact global statistics — equal-size blocks, so the global
              mean is the mean of block means) + one fused chain pass
              that normalises with the exact stats and emits only the
              pooled [B, C_out] feature.
  backward  = one top pass (max-pool scatter + per-block reduction rows
              for the last layer) + L per-layer passes walking the chain
              downward. The exact-BN backward's global coupling per layer
              is two [C] vectors, sum(dy) and sum(dy*xhat) — exactly
              (dbeta, dgamma), which the pass ABOVE emits per block; the
              cross-block sums happen outside in XLA (a psum under a
              sharded caller) and give the dz correction terms
              r1 = gamma*dbeta/M, r2 = gamma*dgamma/M. The running
              gradient dh_i is spilled to HBM once per layer boundary
              instead of every activation in both directions.

Cost model vs the XLA chain at the headline shape (B=1024, N=1024): the
XLA exact-BN step moves ~11 GB of HBM activation traffic (BENCHMARKS.md
round-2 device profile); this kernel moves only the dh spills (~2 GB
f32) and pays ~7x one chain's matmul FLOPs in VMEM recompute — the right
trade on a bandwidth-bound step.

Reference semantics: the per-point conv+BN+ReLU chain and global max of
registration/src/samplenet.py:40-50,90-97 (torch BatchNorm1d batch-global
statistics — what this kernel reproduces exactly, unlike the ghost
variant which reproduces the reference's per-device multi-GPU behavior).

Dense biases never enter the kernels (BN's mean subtraction cancels a
per-channel bias exactly); they only shift the EMA mean, applied outside
— same contract as the ghost kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samplenet_tpu.ops.pallas.partitioning import batch_partition
from samplenet_tpu.ops.pallas.point_mlp_train_kernel import (
    _pad_row,
    _prep,
    _weight_specs,
)

_VMEM_BUDGET = 10 * 1024 * 1024


def auto_block_b_exact(batch: int, n: int, widths: tuple[int, ...],
                       bf16: bool = False) -> int | None:
    """Largest power-of-two batch block that divides `batch` and fits the
    backward pass's VMEM plan (~9 live [C_max, bb*N] f32 temporaries).
    Unlike the ghost kernel the block size has NO semantic meaning here
    (statistics are global regardless) — it is purely a tiling choice."""
    del bf16  # temporaries are f32 either way; bf16 only speeds the dots
    per_lane = 9 * max(widths) * 4 + 3 * 4
    bb_max = _VMEM_BUDGET // max(n * per_lane, 1)
    if bb_max < 1:
        return None
    bb = 1
    while bb * 2 <= bb_max and batch % (bb * 2) == 0:
        bb *= 2
    if batch % bb:
        return None
    return bb


def _chain_to(h, packs, upto, wdt, keep_from=None):
    """Run layers [0, upto) of the exact-stats chain on a [C, M] block.

    packs = flat per-layer (wt, gamma, beta, mu, rstd) refs. Returns
    (h_upto, kept) where kept[i] = (h_i, xhat_i) for i >= keep_from."""
    kept = {}
    for i in range(upto):
        wt, gamma, beta, mu, rstd = packs[5 * i : 5 * i + 5]
        z = jnp.dot(wt[...].astype(wdt), h.astype(wdt),
                    preferred_element_type=jnp.float32)
        xhat = (z - mu[...]) * rstd[...]
        h = jnp.maximum(gamma[...] * xhat + beta[...], 0.0)
        if keep_from is not None and i >= keep_from:
            kept[i] = (h, xhat)
    return h, kept


# ---------------------------------------------------------------- kernels


def _stats_kernel(xb_ref, *refs, lyr: int, bf16: bool, cmax: int):
    """Per-block (mean, mean-square) rows of layer `lyr`'s pre-BN z."""
    out_ref = refs[-1]
    bb = xb_ref.shape[1]
    wdt = jnp.bfloat16 if bf16 else jnp.float32
    h = jnp.concatenate([xb_ref[0, bi] for bi in range(bb)], axis=1)
    h, _ = _chain_to(h, refs, lyr, wdt)
    wt_l = refs[5 * lyr]
    z = jnp.dot(wt_l[...].astype(wdt), h.astype(wdt),
                preferred_element_type=jnp.float32)
    out_ref[0, 0, :] = _pad_row(jnp.mean(z, axis=1, keepdims=True), cmax)[0]
    out_ref[0, 1, :] = _pad_row(jnp.mean(z * z, axis=1, keepdims=True),
                                cmax)[0]


def _chain_kernel(xb_ref, *refs, n_layers: int, bf16: bool):
    """Full chain with exact stats + per-cloud max over points."""
    pooled_ref = refs[-1]
    bb, _, n = xb_ref.shape[1:]
    wdt = jnp.bfloat16 if bf16 else jnp.float32
    h = jnp.concatenate([xb_ref[0, bi] for bi in range(bb)], axis=1)
    h, _ = _chain_to(h, refs, n_layers, wdt)
    for bi in range(bb):
        pooled_ref[0, bi, :] = jnp.max(h[:, bi * n : (bi + 1) * n], axis=1)


def _maxpool_bwd(h_last, g, bb, n):
    """Route g [bb, C] to each cloud's lane argmax of h_last [C, M]."""
    parts = []
    for bi in range(bb):
        hs = h_last[:, bi * n : (bi + 1) * n]
        amax = jnp.argmax(hs, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, hs.shape, 1)
        parts.append((lane == amax[:, None]).astype(jnp.float32)
                     * g[bi][:, None])
    return jnp.concatenate(parts, axis=1)  # [C, M]


def _top_kernel(xb_ref, g_ref, *refs, n_layers: int, bf16: bool, cmax: int):
    """Max-pool backward + per-block (sum dy, sum dy*xhat) reduction rows
    for the LAST layer — the global coupling the first bwd pass needs."""
    out_ref = refs[-1]
    bb, _, n = xb_ref.shape[1:]
    wdt = jnp.bfloat16 if bf16 else jnp.float32
    h0 = jnp.concatenate([xb_ref[0, bi] for bi in range(bb)], axis=1)
    h, kept = _chain_to(h0, refs, n_layers, wdt, keep_from=n_layers - 1)
    h_last, xhat_last = kept[n_layers - 1]
    dh = _maxpool_bwd(h_last, g_ref[0], bb, n)
    dy = jnp.where(h_last > 0.0, dh, 0.0)
    out_ref[0, 0, :] = _pad_row(jnp.sum(dy, axis=1, keepdims=True), cmax)[0]
    out_ref[0, 1, :] = _pad_row(
        jnp.sum(dy * xhat_last, axis=1, keepdims=True), cmax)[0]


def _bwd_kernel(xb_ref, dh_or_g_ref, *refs, lyr: int, n_layers: int,
                top: bool, bf16: bool, cmax: int, spill_f32: bool):
    """Backward for layer `lyr` given its global correction terms.

    Consumes dh_lyr (spilled by the pass above, or re-derived from the
    pooled cotangent when `top`), emits the per-block dW partial, and —
    for lyr > 0 — the next layer down's reduction rows plus its dh spill;
    for lyr == 0 the dx block."""
    i = lyr
    if i > 0:
        dw_ref, rows_ref, spill_ref = refs[-3], refs[-2], refs[-1]
    else:
        dw_ref, dx_ref = refs[-2], refs[-1]
    r1_ref, r2_ref = refs[5 * (i + 1)], refs[5 * (i + 1) + 1]
    bb, _, n = xb_ref.shape[1:]
    wdt = jnp.bfloat16 if bf16 else jnp.float32
    h0 = jnp.concatenate([xb_ref[0, bi] for bi in range(bb)], axis=1)
    keep_from = max(i - 1, 0)
    _, kept = _chain_to(h0, refs, i + 1, wdt, keep_from=keep_from)
    h_i, xhat_i = kept[i]
    h_prev = kept[i - 1][0] if i > 0 else h0
    wt, gamma = refs[5 * i], refs[5 * i + 1]

    if top:
        dh = _maxpool_bwd(h_i, dh_or_g_ref[0], bb, n)
    else:
        dh = dh_or_g_ref[0].astype(jnp.float32)
    dy = jnp.where(h_i > 0.0, dh, 0.0)
    dxhat = dy * gamma[...]
    dz = refs[5 * i + 4][...] * (dxhat - r1_ref[...] - xhat_i * r2_ref[...])

    dims = (((1,), (1,)), ((), ()))  # contract the lane axis
    dw_ref[0] = jax.lax.dot_general(
        h_prev.astype(wdt), dz.astype(wdt), dimension_numbers=dims,
        preferred_element_type=jnp.float32)
    dh_prev = jax.lax.dot_general(
        wt[...].astype(wdt), dz.astype(wdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if i > 0:
        xhat_prev = kept[i - 1][1]
        dy_prev = jnp.where(h_prev > 0.0, dh_prev, 0.0)
        rows_ref[0, 0, :] = _pad_row(
            jnp.sum(dy_prev, axis=1, keepdims=True), cmax)[0]
        rows_ref[0, 1, :] = _pad_row(
            jnp.sum(dy_prev * xhat_prev, axis=1, keepdims=True), cmax)[0]
        spill_ref[0] = (dh_prev if spill_f32
                        else dh_prev.astype(jnp.bfloat16))
    else:
        for bi in range(bb):
            dx_ref[0, bi] = dh_prev[:, bi * n : (bi + 1) * n]


# ------------------------------------------------------- pallas_call impls


def _block_specs(xb):
    p, bb, cin, n = xb.shape
    return pl.BlockSpec((1, bb, cin, n), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _stats_impl(*ops):
    *tensors, bf16, interpret = ops
    xb, packs, wt_l = tensors[0], tensors[1:-1], tensors[-1]
    lyr = len(packs) // 5
    p = xb.shape[0]
    cmax = max(128, max(t.shape[0] for t in [*packs[::5], wt_l]))
    kernel = functools.partial(_stats_kernel, lyr=lyr, bf16=bf16, cmax=cmax)
    rows = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[_block_specs(xb)] + _weight_specs([*packs, wt_l]),
        out_specs=pl.BlockSpec((1, 2, cmax), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, 2, cmax), jnp.float32),
        interpret=interpret,
    )(xb, *packs, wt_l)
    return rows


def _chain_impl(*ops):
    *tensors, bf16, interpret = ops
    xb, packs = tensors[0], tensors[1:]
    n_layers = len(packs) // 5
    p, bb = xb.shape[:2]
    c_out = packs[5 * (n_layers - 1)].shape[0]
    kernel = functools.partial(_chain_kernel, n_layers=n_layers, bf16=bf16)
    return pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[_block_specs(xb)] + _weight_specs(list(packs)),
        out_specs=pl.BlockSpec((1, bb, c_out), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, bb, c_out), jnp.float32),
        interpret=interpret,
    )(xb, *packs)


def _top_impl(*ops):
    *tensors, bf16, interpret = ops
    xb, gb, packs = tensors[0], tensors[1], tensors[2:]
    n_layers = len(packs) // 5
    p, bb = xb.shape[:2]
    cmax = max(128, max(t.shape[0] for t in packs[::5]))
    kernel = functools.partial(_top_kernel, n_layers=n_layers, bf16=bf16,
                               cmax=cmax)
    return pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[
            _block_specs(xb),
            pl.BlockSpec((1, bb) + gb.shape[2:], lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + _weight_specs(list(packs)),
        out_specs=pl.BlockSpec((1, 2, cmax), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, 2, cmax), jnp.float32),
        interpret=interpret,
    )(xb, gb, *packs)


def _bwd_call_impl(*ops):
    *tensors, top, bf16, interpret = ops
    xb, dh_or_g = tensors[0], tensors[1]
    packs, (r1, r2) = tensors[2:-2], tensors[-2:]
    i = len(packs) // 5 - 1
    p, bb, cin, n = xb.shape
    widths = [t.shape[0] for t in packs[::5]]
    cmax = max(128, max(widths))
    spill_f32 = not bf16
    kernel = functools.partial(
        _bwd_kernel, lyr=i, n_layers=len(widths), top=top, bf16=bf16,
        cmax=cmax, spill_f32=spill_f32)
    co, ci = packs[5 * i].shape
    dw_spec = pl.BlockSpec((1, ci, co), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    dw_shape = jax.ShapeDtypeStruct((p, ci, co), jnp.float32)
    if top:
        dh_spec = pl.BlockSpec((1, bb) + dh_or_g.shape[2:],
                               lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    else:
        dh_spec = pl.BlockSpec((1,) + dh_or_g.shape[1:],
                               lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [_block_specs(xb), dh_spec] + _weight_specs(
        [*packs, r1, r2])
    if i > 0:
        c_prev = widths[i - 1]
        sdt = jnp.float32 if spill_f32 else jnp.bfloat16
        out_specs = (
            dw_spec,
            pl.BlockSpec((1, 2, cmax), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_prev, bb * n), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        )
        out_shape = (
            dw_shape,
            jax.ShapeDtypeStruct((p, 2, cmax), jnp.float32),
            jax.ShapeDtypeStruct((p, c_prev, bb * n), sdt),
        )
    else:
        out_specs = (dw_spec, _block_specs(xb))
        out_shape = (dw_shape,
                     jax.ShapeDtypeStruct((p, bb, cin, n), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(xb, dh_or_g, *packs, r1, r2)


# ------------------------------------------------- partitioning wrappers


def _rule(in_ranks, out_ranks):
    """Shardy rule: 'p' shared on batch-leading dims, fresh factors
    elsewhere. in_ranks/out_ranks: list of (rank, leading_p)."""
    ctr = iter(range(1000))

    def term(rank, leading):
        dims = (["p"] if leading else []) + [
            f"f{next(ctr)}" for _ in range(rank - (1 if leading else 0))]
        return " ".join(dims)

    lhs = ", ".join(term(r, lp) for r, lp in in_ranks)
    rhs = ", ".join(term(r, lp) for r, lp in out_ranks)
    return lhs + " -> " + rhs


_cp_cache: dict = {}


def _cp_stats(lyr: int):
    key = ("stats", lyr)
    if key not in _cp_cache:
        n_ops = 2 + 5 * lyr
        _cp_cache[key] = batch_partition(
            _stats_impl,
            rule=_rule([(4, True)] + [(2, False)] * (n_ops - 1),
                       [(3, True)]),
            static_argnums=(n_ops, n_ops + 1),
            replicated_argnums=tuple(range(1, n_ops)))
    return _cp_cache[key]


def _cp_chain(n_layers: int):
    key = ("chain", n_layers)
    if key not in _cp_cache:
        n_ops = 1 + 5 * n_layers
        _cp_cache[key] = batch_partition(
            _chain_impl,
            rule=_rule([(4, True)] + [(2, False)] * (n_ops - 1),
                       [(3, True)]),
            static_argnums=(n_ops, n_ops + 1),
            replicated_argnums=tuple(range(1, n_ops)))
    return _cp_cache[key]


def _cp_top(n_layers: int):
    key = ("top", n_layers)
    if key not in _cp_cache:
        n_ops = 2 + 5 * n_layers
        _cp_cache[key] = batch_partition(
            _top_impl,
            rule=_rule([(4, True), (3, True)] + [(2, False)] * (n_ops - 2),
                       [(3, True)]),
            static_argnums=(n_ops, n_ops + 1),
            replicated_argnums=tuple(range(2, n_ops)))
    return _cp_cache[key]


def _cp_bwd(lyr: int, top: bool):
    key = ("bwd", lyr, top)
    if key not in _cp_cache:
        n_ops = 4 + 5 * (lyr + 1)
        outs = ([(3, True), (3, True), (3, True)] if lyr > 0
                else [(3, True), (4, True)])
        _cp_cache[key] = batch_partition(
            _bwd_call_impl,
            rule=_rule([(4, True), (3, True)]
                       + [(2, False)] * (n_ops - 2), outs),
            static_argnums=(n_ops, n_ops + 1, n_ops + 2),
            replicated_argnums=tuple(range(2, n_ops)))
    return _cp_cache[key]


# ------------------------------------------------------------ entry point


def _interleave(wgbs, mus, rstds):
    """(wt, gamma, beta) triples + stats -> flat per-layer 5-packs."""
    packs = []
    for i in range(len(mus)):
        packs += [wgbs[3 * i], wgbs[3 * i + 1], wgbs[3 * i + 2],
                  mus[i], rstds[i]]
    return packs


def _exact_stats(xt, wgbs, widths, eps, bf16, interpret):
    """L stats passes -> exact global (mu, rstd) columns per layer."""
    mus, rstds, vars_ = [], [], []
    for lyr, c in enumerate(widths):
        ops = [xt] + _interleave(wgbs, mus, rstds) + [wgbs[3 * lyr]]
        rows = _cp_stats(lyr)(*ops, bf16, interpret)
        r = jnp.mean(rows, axis=0)          # psum under a sharded caller
        mu = r[0, :c]
        var = r[1, :c] - mu * mu
        mus.append(mu.reshape(-1, 1))
        rstds.append(jax.lax.rsqrt(var + eps).reshape(-1, 1))
        vars_.append(var)
    return mus, rstds, vars_


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _pme(x, weights, biases, gammas, betas, eps, block_b, bf16, interpret):
    pooled, means, vars_, _ = _pme_run(
        x, weights, biases, gammas, betas, eps, block_b, bf16, interpret)
    return pooled, means, vars_


def _pme_run(x, weights, biases, gammas, betas, eps, block_b, bf16,
             interpret):
    b = x.shape[0]
    widths = tuple(w.shape[1] for w in weights)
    xt, wgbs = _prep(x, weights, gammas, betas, block_b)
    xt = xt.astype(jnp.float32)
    mus, rstds, vars_ = _exact_stats(xt, wgbs, widths, eps, bf16, interpret)
    packs = _interleave(wgbs, mus, rstds)
    pooled = _cp_chain(len(widths))(xt, *packs, bf16, interpret)
    means = tuple(m[:, 0] + jnp.asarray(bi, jnp.float32)
                  for m, bi in zip(mus, biases))
    return pooled.reshape(b, -1), means, tuple(vars_), (mus, rstds)


def _pme_fwd(x, weights, biases, gammas, betas, eps, block_b, bf16,
             interpret):
    pooled, means, vars_, stats = _pme_run(
        x, weights, biases, gammas, betas, eps, block_b, bf16, interpret)
    return (pooled, means, vars_), (x, weights, gammas, betas, stats)


def _pme_bwd(eps, block_b, bf16, interpret, residuals, cts):
    x, weights, gammas, betas, (mus, rstds) = residuals
    g_pooled = cts[0]                   # stats cotangents are EMA-only
    b, n, cin = x.shape
    widths = tuple(w.shape[1] for w in weights)
    m_total = float(b * n)
    xt, wgbs = _prep(x, weights, gammas, betas, block_b)
    xt = xt.astype(jnp.float32)
    packs = _interleave(wgbs, mus, rstds)
    n_layers = len(widths)
    gb = g_pooled.astype(jnp.float32).reshape(b // block_b, block_b, -1)

    rows = jnp.sum(_cp_top(n_layers)(xt, gb, *packs, bf16, interpret),
                   axis=0)
    dws, dgammas, dbetas = [None] * n_layers, [None] * n_layers, \
        [None] * n_layers
    carry = gb
    dx = None
    for i in range(n_layers - 1, -1, -1):
        c = widths[i]
        dbeta, dgamma = rows[0, :c], rows[1, :c]
        dgammas[i], dbetas[i] = dgamma, dbeta
        gcol = wgbs[3 * i + 1]          # [C, 1]
        r1 = (gcol[:, 0] * dbeta / m_total).reshape(-1, 1)
        r2 = (gcol[:, 0] * dgamma / m_total).reshape(-1, 1)
        ops = [xt, carry] + packs[: 5 * (i + 1)] + [r1, r2]
        outs = _cp_bwd(i, i == n_layers - 1)(*ops, i == n_layers - 1,
                                             bf16, interpret)
        if i > 0:
            dw_b, rows_b, carry = outs
            rows = jnp.sum(rows_b, axis=0)
        else:
            dw_b, dx_b = outs
            dx = jnp.swapaxes(dx_b.reshape(b, cin, n), 1, 2)
        dws[i] = jnp.sum(dw_b, axis=0)
    dbiases = tuple(jnp.zeros((c,), jnp.float32) for c in widths)
    return dx, tuple(dws), dbiases, tuple(dgammas), tuple(dbetas)


_pme.defvjp(_pme_fwd, _pme_bwd)


@functools.partial(
    jax.jit, static_argnames=("eps", "block_b", "bf16", "interpret"))
def point_mlp_exact_train_max(
    x: jax.Array,                # [B, N, C_in]
    weights: tuple,              # per layer [C_in_i, C_out_i] (flax kernel)
    biases: tuple,               # per layer [C_out_i] (EMA mean shift only)
    gammas: tuple,               # per layer BN scale [C_out_i]
    betas: tuple,                # per layer BN bias [C_out_i]
    *,
    eps: float = 1e-5,
    block_b: int | None = None,
    bf16: bool = False,
    interpret: bool = False,
):
    """Fused EXACT-BN train forward: per-point MLP chain + global max.

    Same contract as `point_mlp_train_max` — returns (pooled [B, C_out],
    batch_means, batch_vars) — but normalisation uses the exact global
    batch statistics, so outputs, gradients, AND the EMA all match the
    XLA chain (flax BatchNorm with use_fast_variance) to matmul
    precision. bf16 trades in-kernel matmul precision for MXU speed;
    the default keeps f32 so the path is a drop-in for the quality
    default. Requires >= 2 layers (single-layer chains gain nothing —
    callers fall back to the XLA path).
    """
    if interpret:
        bf16 = False
    widths = tuple(w.shape[1] for w in weights)
    if len(widths) < 2:
        raise ValueError("exact fused chain needs >= 2 layers")
    if block_b is None:
        block_b = auto_block_b_exact(x.shape[0], x.shape[1], widths, bf16)
    if block_b is None or x.shape[0] % block_b:
        raise ValueError(
            f"no valid batch block for B={x.shape[0]}, N={x.shape[1]}; "
            "caller should fall back to the XLA chain")
    return _pme(x, tuple(weights), tuple(biases), tuple(gammas),
                tuple(betas), eps, block_b, bf16, interpret)
