"""Fused per-point-MLP training kernel (ghost BatchNorm + max-pool).

The TRAIN-path simplification chain (per-point MLP with batch-stat BN,
registration/src/samplenet.py:40-50,90-97) is the dominant cost of the
sampler train step: each of its 5 layers round-trips a [B, N, C]
activation through HBM in the forward AND the backward (~11 GB/step at
the headline shape, BENCHMARKS.md round-2 device profile), while the
weights total < 60 KB. The eval forward already runs fused
(point_mlp_kernel.py) because eval BN folds into an affine; train-mode
BN does not — its statistics couple every point in the batch, forcing
XLA to materialise each layer.

This kernel breaks the coupling with GHOST BatchNorm: statistics are
computed per batch-BLOCK (block_b elements x N points, >= 2k samples per
stat), which is exactly the semantics the reference has under multi-GPU
data parallelism (torch BatchNorm1d normalises per device, no sync-BN
anywhere in the reference). The whole chain — matmuls, block-stat BN,
ReLU, final max over points — runs in one VMEM pass per block:

  * forward emits the pooled [B, C_out] feature plus per-block (mean,
    mean-square) rows so the caller reconstructs EXACT global batch
    statistics for the running-average EMA (equal-size blocks: the
    global mean is the mean of block means; the global E[z^2] likewise);
  * backward re-runs the forward chain in VMEM (activations never hit
    HBM), storing only the per-layer normalised activations x_hat as
    bf16 block-local values, then walks the chain in reverse: max-pool
    scatter via lane argmax, folded BN+ReLU backward, dW via a lane
    contraction, dx via the transposed matmul.

All kernel outputs keep the batch BLOCK dim leading ([P, ...] with
P = B / block_b), so SPMD partitioning is the same dim-0 contract as
every other kernel here (partitioning.py) and the tiny cross-block
reductions (global stats, dW sums) happen OUTSIDE the partitioned call
in plain XLA, which inserts the correct collectives under a sharded
caller.

Dense biases never enter the kernels: BN's mean subtraction cancels a
per-channel bias exactly, so pooled features and every gradient are
independent of it (its gradient is identically zero, as in the XLA
path); the bias only shifts the EMA mean, which is applied outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samplenet_tpu.ops.pallas.partitioning import batch_partition

_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under the 16 MB scope


def auto_block_b(batch: int, n: int, widths: tuple[int, ...],
                 bf16: bool = True) -> int | None:
    """Largest power-of-two batch block that (a) divides `batch` (ghost
    stats must not mix padding into a block) and (b) fits the BACKWARD
    kernel's VMEM plan: per-layer x_hat stores + 3 live [C_max, bb*N]
    f32 temporaries. Returns None when no block fits (caller falls back
    to the XLA chain)."""
    store_bytes = sum(widths) * (2 if bf16 else 4)
    temp_bytes = 3 * max(widths) * 4
    per_lane = n * (store_bytes + temp_bytes)
    bb_max = _VMEM_BUDGET // max(per_lane, 1)
    bb = 1
    while bb * 2 <= min(bb_max, 64) and batch % (bb * 2) == 0:
        bb *= 2
    if bb > bb_max or batch % bb:
        return None
    return bb


def _layer_forward(h, wt, gamma, beta, eps, wdt, stats_sink=None):
    """One fused layer on a [C_in, M] lane-major block: matmul, ghost-BN
    over the M lanes, affine, ReLU. Returns (h_next, x_hat)."""
    z = jnp.dot(wt[...].astype(wdt), h.astype(wdt),
                preferred_element_type=jnp.float32)
    mu = jnp.mean(z, axis=1, keepdims=True)            # [C, 1]
    msq = jnp.mean(z * z, axis=1, keepdims=True)
    var = msq - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (z - mu) * rstd
    y = gamma[...] * xhat + beta[...]
    if stats_sink is not None:
        stats_sink(mu, msq)
    return jnp.maximum(y, 0.0), xhat


def _pad_row(v, cmax):
    """[C, 1] column -> [1, cmax] zero-padded lane row."""
    row = v.reshape(1, -1)
    c = row.shape[1]
    if c < cmax:
        row = jnp.concatenate(
            [row, jnp.zeros((1, cmax - c), jnp.float32)], axis=1)
    return row


def _fwd_kernel(xb_ref, *refs, n_layers: int, bf16: bool, eps: float,
                cmax: int):
    pooled_ref, stats_ref = refs[-2], refs[-1]
    bb, _, n = xb_ref.shape[1:]
    wdt = jnp.bfloat16 if bf16 else jnp.float32
    h = jnp.concatenate([xb_ref[0, bi] for bi in range(bb)], axis=1)
    for i in range(n_layers):
        wt, gamma, beta = refs[3 * i], refs[3 * i + 1], refs[3 * i + 2]

        def sink(mu, msq, i=i):
            stats_ref[0, 2 * i, :] = _pad_row(mu, cmax)[0]
            stats_ref[0, 2 * i + 1, :] = _pad_row(msq, cmax)[0]

        h, _ = _layer_forward(h, wt, gamma, beta, eps, wdt, stats_sink=sink)
    for bi in range(bb):
        pooled_ref[0, bi, :] = jnp.max(h[:, bi * n : (bi + 1) * n], axis=1)


def _bwd_kernel(xb_ref, g_ref, *refs, n_layers: int, bf16: bool,
                eps: float, cmax: int):
    dx_ref = refs[3 * n_layers]
    dw_refs = refs[3 * n_layers + 1 : 3 * n_layers + 1 + n_layers]
    dgb_ref = refs[-1]
    bb, _, n = xb_ref.shape[1:]
    m = bb * n
    wdt = jnp.bfloat16 if bf16 else jnp.float32
    sdt = jnp.bfloat16 if bf16 else jnp.float32   # x_hat store dtype

    # ---- forward recompute, storing x_hat per layer (block-local) ----
    h0 = jnp.concatenate([xb_ref[0, bi] for bi in range(bb)], axis=1)
    h = h0
    xhats = []
    for i in range(n_layers):
        wt, gamma, beta = refs[3 * i], refs[3 * i + 1], refs[3 * i + 2]
        h, xhat = _layer_forward(h, wt, gamma, beta, eps, wdt)
        xhats.append(xhat.astype(sdt))

    # ---- max-pool backward: route g to each element's lane argmax ----
    g = g_ref[0]                                    # [bb, C_L]
    dh_parts = []
    for bi in range(bb):
        hs = h[:, bi * n : (bi + 1) * n]            # [C_L, N]
        amax = jnp.argmax(hs, axis=1)               # [C_L]
        lane = jax.lax.broadcasted_iota(jnp.int32, hs.shape, 1)
        onehot = (lane == amax[:, None]).astype(jnp.float32)
        dh_parts.append(onehot * g[bi][:, None])
    dh = jnp.concatenate(dh_parts, axis=1)          # [C_L, M]

    # ---- chain backward ----
    dims = (((1,), (1,)), ((), ()))                 # contract the lane axis
    for i in range(n_layers - 1, -1, -1):
        wt, gamma, beta = refs[3 * i], refs[3 * i + 1], refs[3 * i + 2]
        xhat = xhats[i].astype(jnp.float32)
        y = gamma[...] * xhat + beta[...]
        dy = jnp.where(y > 0.0, dh, 0.0)
        dgamma = jnp.sum(dy * xhat, axis=1, keepdims=True)   # [C, 1]
        dbeta = jnp.sum(dy, axis=1, keepdims=True)
        dgb_ref[0, 2 * i, :] = _pad_row(dgamma, cmax)[0]
        dgb_ref[0, 2 * i + 1, :] = _pad_row(dbeta, cmax)[0]
        dxhat = dy * gamma[...]
        # ghost-BN backward over the block's M samples:
        # dz = rstd * (dxhat - mean(dxhat) - xhat * mean(dxhat * xhat)).
        # Only x_hat is stored (bf16, block-local); rstd is NOT derivable
        # from x_hat alone, so it is recomputed below from this layer's z
        # (one extra matmul in VMEM — cheaper than storing per-block stats
        # rows for every layer in HBM).
        dz_unscaled = (
            dxhat
            - jnp.mean(dxhat, axis=1, keepdims=True)
            - xhat * jnp.mean(dxhat * xhat, axis=1, keepdims=True)
        )
        # recover rstd: recompute z for this layer from h_{i-1}
        if i == 0:
            h_prev = h0
        else:
            xh_p = xhats[i - 1].astype(jnp.float32)
            gp, bp = refs[3 * (i - 1) + 1], refs[3 * (i - 1) + 2]
            h_prev = jnp.maximum(gp[...] * xh_p + bp[...], 0.0)
        z = jnp.dot(wt[...].astype(wdt), h_prev.astype(wdt),
                    preferred_element_type=jnp.float32)
        mu = jnp.mean(z, axis=1, keepdims=True)
        var = jnp.mean(z * z, axis=1, keepdims=True) - mu * mu
        rstd = jax.lax.rsqrt(var + eps)
        dz = rstd * dz_unscaled
        # dW in flax orientation [C_in, C_out] = h_{i-1} @ dz^T
        dw_refs[i][0] = jax.lax.dot_general(
            h_prev.astype(wdt), dz.astype(wdt), dimension_numbers=dims,
            preferred_element_type=jnp.float32)
        # dh_{i-1} = W dz  (wt is [C_out, C_in])
        dh = jax.lax.dot_general(
            wt[...].astype(wdt), dz.astype(wdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    for bi in range(bb):
        dx_ref[0, bi] = dh[:, bi * n : (bi + 1) * n]


def _weight_specs(wgbs):
    specs = []
    for a in wgbs:
        specs.append(pl.BlockSpec(a.shape, lambda p, nd=a.ndim: (0,) * nd,
                                  memory_space=pltpu.VMEM))
    return specs


def _fwd_impl(xb, *wgb_then_static):
    *wgbs, eps, bf16, interpret = wgb_then_static
    p, bb, cin, n = xb.shape
    n_layers = len(wgbs) // 3
    c_out = wgbs[3 * (n_layers - 1)].shape[0]
    cmax = max(wgbs[3 * i].shape[0] for i in range(n_layers))
    cmax = max(cmax, 128)
    kernel = functools.partial(_fwd_kernel, n_layers=n_layers, bf16=bf16,
                               eps=eps, cmax=cmax)
    in_specs = [pl.BlockSpec((1, bb, cin, n), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += _weight_specs(wgbs)
    pooled, stats = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, bb, c_out), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * n_layers, cmax), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p, bb, c_out), jnp.float32),
            jax.ShapeDtypeStruct((p, 2 * n_layers, cmax), jnp.float32),
        ),
        interpret=interpret,
    )(xb.astype(jnp.float32), *wgbs)
    return pooled, stats


def _bwd_impl(xb, g, *wgb_then_static):
    *wgbs, eps, bf16, interpret = wgb_then_static
    p, bb, cin, n = xb.shape
    n_layers = len(wgbs) // 3
    cmax = max(wgbs[3 * i].shape[0] for i in range(n_layers))
    cmax = max(cmax, 128)
    kernel = functools.partial(_bwd_kernel, n_layers=n_layers, bf16=bf16,
                               eps=eps, cmax=cmax)
    c_out = wgbs[3 * (n_layers - 1)].shape[0]
    in_specs = [
        pl.BlockSpec((1, bb, cin, n), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bb, c_out), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    in_specs += _weight_specs(wgbs)
    dw_shapes = []
    dw_specs = []
    for i in range(n_layers):
        co, ci = wgbs[3 * i].shape
        dw_shapes.append(jax.ShapeDtypeStruct((p, ci, co), jnp.float32))
        dw_specs.append(pl.BlockSpec((1, ci, co), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    dx, *dws, dgb = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, bb, cin, n), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *dw_specs,
            pl.BlockSpec((1, 2 * n_layers, cmax), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p, bb, cin, n), jnp.float32),
            *dw_shapes,
            jax.ShapeDtypeStruct((p, 2 * n_layers, cmax), jnp.float32),
        ),
        interpret=interpret,
    )(xb.astype(jnp.float32), g.astype(jnp.float32), *wgbs)
    return (dx, *dws, dgb)


def _fwd_rule(n_layers: int) -> str:
    terms = ["p bb c0 n"]
    for i in range(n_layers):
        terms += [f"c{i + 1} c{i}", f"c{i + 1} u{i}", f"c{i + 1} v{i}"]
    return ", ".join(terms) + f" -> p bb c{n_layers}, p s t"


def _bwd_rule(n_layers: int) -> str:
    terms = ["p bb c0 n", f"p bb c{n_layers}"]
    outs = ["p bb c0 n"]
    for i in range(n_layers):
        terms += [f"c{i + 1} c{i}", f"c{i + 1} u{i}", f"c{i + 1} v{i}"]
        outs.append(f"p d{i} e{i}")
    outs.append("p s t")
    return ", ".join(terms) + " -> " + ", ".join(outs)


_cp_cache: dict = {}


def _cp_fwd(n_layers: int):
    key = ("fwd", n_layers)
    if key not in _cp_cache:
        n_ops = 1 + 3 * n_layers
        _cp_cache[key] = batch_partition(
            _fwd_impl, rule=_fwd_rule(n_layers),
            static_argnums=(n_ops, n_ops + 1, n_ops + 2),
            replicated_argnums=tuple(range(1, n_ops)))
    return _cp_cache[key]


def _cp_bwd(n_layers: int):
    key = ("bwd", n_layers)
    if key not in _cp_cache:
        n_ops = 2 + 3 * n_layers
        _cp_cache[key] = batch_partition(
            _bwd_impl, rule=_bwd_rule(n_layers),
            static_argnums=(n_ops, n_ops + 1, n_ops + 2),
            replicated_argnums=tuple(range(2, n_ops)))
    return _cp_cache[key]


def _prep(x, weights, gammas, betas, block_b):
    """[B, N, C] -> [P, bb, C, N] blocks + kernel-layout params."""
    b, n, cin = x.shape
    xt = jnp.swapaxes(x, 1, 2).reshape(b // block_b, block_b, cin, n)
    wgbs = []
    for w, gm, bt in zip(weights, gammas, betas):
        wgbs.append(jnp.asarray(w, jnp.float32).T)       # [C_out, C_in]
        wgbs.append(jnp.asarray(gm, jnp.float32).reshape(-1, 1))
        wgbs.append(jnp.asarray(bt, jnp.float32).reshape(-1, 1))
    return xt, wgbs


def _stats_from_rows(stats, biases, widths):
    """[P, 2L, cmax] block rows -> per-layer exact global (mean, var).

    Block rows hold the bias-free (mean', mean-square') of each equal-size
    block, so the global mean is the block average plus the dense bias and
    the global variance is E[z'^2] - E[z']^2 (flax's use_fast_variance)."""
    means, vars_ = [], []
    rows = jnp.mean(stats, axis=0)                       # [2L, cmax]
    for i, (bias, c) in enumerate(zip(biases, widths)):
        mu = rows[2 * i, :c]
        msq = rows[2 * i + 1, :c]
        means.append(mu + jnp.asarray(bias, jnp.float32))
        vars_.append(msq - mu * mu)
    return tuple(means), tuple(vars_)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _pmt(x, weights, biases, gammas, betas, eps, block_b, bf16, interpret):
    pooled, means, vars_, _ = _pmt_run(
        x, weights, biases, gammas, betas, eps, block_b, bf16, interpret)
    return pooled, means, vars_


def _pmt_run(x, weights, biases, gammas, betas, eps, block_b, bf16,
             interpret):
    b, n, _ = x.shape
    widths = tuple(w.shape[1] for w in weights)
    xt, wgbs = _prep(x, weights, gammas, betas, block_b)
    pooled, stats = _cp_fwd(len(widths))(xt, *wgbs, eps, bf16, interpret)
    means, vars_ = _stats_from_rows(stats, biases, widths)
    return pooled.reshape(b, -1), means, vars_, None


def _pmt_fwd(x, weights, biases, gammas, betas, eps, block_b, bf16,
             interpret):
    pooled, means, vars_, _ = _pmt_run(
        x, weights, biases, gammas, betas, eps, block_b, bf16, interpret)
    return (pooled, means, vars_), (x, weights, gammas, betas)


def _pmt_bwd(eps, block_b, bf16, interpret, residuals, cts):
    x, weights, gammas, betas = residuals
    g_pooled = cts[0]                   # stats cotangents are EMA-only
    b, n, _ = x.shape
    widths = tuple(w.shape[1] for w in weights)
    xt, wgbs = _prep(x, weights, gammas, betas, block_b)
    gb = g_pooled.reshape(b // block_b, block_b, -1)
    dx_b, *dws_b, dgb = _cp_bwd(len(widths))(
        xt, gb, *wgbs, eps, bf16, interpret)
    dx = jnp.swapaxes(
        dx_b.reshape(b, x.shape[2], n), 1, 2)            # [B, N, C_in]
    dws = tuple(jnp.sum(dw, axis=0) for dw in dws_b)     # [C_in, C_out]
    rows = jnp.sum(dgb, axis=0)
    dgammas = tuple(rows[2 * i, :c] for i, c in enumerate(widths))
    dbetas = tuple(rows[2 * i + 1, :c] for i, c in enumerate(widths))
    dbiases = tuple(jnp.zeros((c,), jnp.float32) for c in widths)
    return dx, dws, dbiases, dgammas, dbetas


_pmt.defvjp(_pmt_fwd, _pmt_bwd)


@functools.partial(
    jax.jit, static_argnames=("eps", "block_b", "bf16", "interpret"))
def point_mlp_train_max(
    x: jax.Array,                # [B, N, C_in]
    weights: tuple,              # per layer [C_in_i, C_out_i] (flax kernel)
    biases: tuple,               # per layer [C_out_i] (EMA mean shift only)
    gammas: tuple,               # per layer BN scale [C_out_i]
    betas: tuple,                # per layer BN bias [C_out_i]
    *,
    eps: float = 1e-5,
    block_b: int | None = None,
    bf16: bool = True,
    interpret: bool = False,
):
    """Fused ghost-BN train forward: per-point MLP chain + global max.

    Returns (pooled [B, C_out], batch_means, batch_vars) where the stats
    tuples are the EXACT global batch statistics of each layer's pre-BN
    activations (for the running-average EMA), while normalisation inside
    the chain uses block-local ghost statistics over block_b*N samples.
    Differentiable in x, weights, gammas, betas; dense-bias gradients are
    identically zero (BN cancels a per-channel bias), matching the XLA
    batch-stat path.
    """
    if interpret:
        bf16 = False
    widths = tuple(w.shape[1] for w in weights)
    if block_b is None:
        block_b = auto_block_b(x.shape[0], x.shape[1], widths, bf16)
    if block_b is None or x.shape[0] % block_b:
        raise ValueError(
            f"no valid batch block for B={x.shape[0]}, N={x.shape[1]}; "
            "caller should fall back to the XLA chain")
    return _pmt(x, tuple(weights), tuple(biases), tuple(gammas),
                tuple(betas), eps, block_b, bf16, interpret)
