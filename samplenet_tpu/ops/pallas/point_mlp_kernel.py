"""Fused per-point-MLP + global-max-pool Pallas kernel (eval forward).

The simplification network's per-point MLP (3->64->64->64->128->128 with
BN+ReLU, registration/src/samplenet.py:40-50,90-97) is 84% of the eval
forward at B=1024 (BENCHMARKS.md round-2 attribution) and HBM-bandwidth
bound: each layer round-trips a [B, N, C] activation through HBM
(~1.3 GB/step), while the weights total < 60 KB.

This kernel runs the WHOLE chain — every layer matmul, the folded
eval-mode BN affine, ReLU, and the global max over points — in one VMEM
pass per batch block. HBM traffic collapses to the [B, N, 3] input read
plus a [B, C_out] output write; inter-layer activations never leave VMEM.
Eval-mode BatchNorm is an affine in the channel axis, so each
(Dense, BN) pair folds into a single (W', b') ahead of the call
(`fold_bn_affine`).

Forward-only by design: at eval the FC head consumes only the pooled
global feature, so per-point activations are not needed downstream; the
training path keeps the differentiable XLA formulation (batch-stat BN is
not foldable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samplenet_tpu.ops.pallas.partitioning import batch_partition


def fold_bn_affine(kernel, bias, scale, bn_bias, mean, var, eps=1e-5):
    """Folds an eval-mode BatchNorm into the preceding Dense layer.

    y = ((x @ W + b) - mean) * scale / sqrt(var + eps) + bn_bias
      =  x @ (W * s) + ((b - mean) * s + bn_bias),  s = scale * rsqrt(var+eps)
    """
    s = scale * jax.lax.rsqrt(var + eps)
    return kernel * s[None, :], (bias - mean) * s + bn_bias


def _point_mlp_kernel(xt_ref, *refs, n_layers: int, bf16: bool):
    # xt_ref: (BB, C_in, N) channel-major — N rides the 128-lane axis, so
    # loads use full lanes (a [BB, N, 3] block would use 3 of 128 lanes and
    # the load alone costs more than the whole XLA path; measured).
    # refs: wT_0, b_0, ..., wT_{L-1}, b_{L-1}, out_ref with wT_i transposed
    # to (C_out, C_in) so every layer is (C_out, C_in) @ (C_in, N).
    out_ref = refs[-1]
    bb, _, n = xt_ref.shape
    wdt = jnp.bfloat16 if bf16 else jnp.float32
    # lay the whole block along the lane axis: ONE (C_out, C_in) @
    # (C_in, BB*N) matmul per layer instead of BB small latency-bound ones
    h = jnp.concatenate([xt_ref[bi] for bi in range(bb)], axis=1)
    for i in range(n_layers):
        wt = refs[2 * i][...]
        b = refs[2 * i + 1][...]           # (C_out, 1)
        # single-pass bf16 MXU with f32 accumulate matches the XLA
        # eval path's precision (default jnp matmul on TPU)
        h = jnp.dot(wt.astype(wdt), h.astype(wdt),
                    preferred_element_type=jnp.float32) + b
        h = jnp.maximum(h, 0.0)
    for bi in range(bb):                   # per-element lane-slice max
        out_ref[bi, :] = jnp.max(h[:, bi * n : (bi + 1) * n], axis=1)


def _impl(xt, *wbs_then_static):
    *wbs, block_b, bf16, interpret = wbs_then_static
    b, cin, n = xt.shape
    n_layers = len(wbs) // 2
    c_out = wbs[-2].shape[0]
    bb = min(block_b, b)
    pad_b = (-b) % bb
    if pad_b:
        xt = jnp.pad(xt, ((0, pad_b), (0, 0), (0, 0)))
    bp = b + pad_b

    kernel = functools.partial(_point_mlp_kernel, n_layers=n_layers,
                               bf16=bf16)
    in_specs = [pl.BlockSpec((bb, cin, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    for wi in range(n_layers):
        w, bias = wbs[2 * wi], wbs[2 * wi + 1]
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(bias.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=(bp // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, c_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, c_out), jnp.float32),
        interpret=interpret,
    )(xt.astype(jnp.float32), *[jnp.asarray(a, jnp.float32) for a in wbs])
    return out[:b]


def _make_rule(n_layers: int) -> str:
    terms = ["b c0 n"]
    for i in range(n_layers):
        terms.append(f"c{i + 1} c{i}")
        terms.append(f"c{i + 1} u{i}")
    return ", ".join(terms) + f" -> b c{n_layers}"


# one partitioned entry per depth (the rule string depends on layer count);
# depth is tiny and fixed per model so the cache never grows past a few
_cp_cache: dict[int, object] = {}


def _cp_for(n_layers: int):
    if n_layers not in _cp_cache:
        n_ops = 1 + 2 * n_layers
        _cp_cache[n_layers] = batch_partition(
            _impl,
            rule=_make_rule(n_layers),
            static_argnums=(n_ops, n_ops + 1, n_ops + 2),
            replicated_argnums=tuple(range(1, n_ops)),
        )
    return _cp_cache[n_layers]


@functools.partial(jax.jit, static_argnames=("block_b", "bf16", "interpret"))
def point_mlp_max(
    x: jax.Array,                 # [B, N, C_in]
    weights_and_biases: tuple,    # (w_0, b_0, ..., w_{L-1}, b_{L-1})
    *,
    block_b: int | None = None,
    bf16: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """max over points of relu-chained per-point MLP. Returns [B, C_out].

    Each w_i is [C_in_i, C_out_i] f32 with eval-BN already folded
    (`fold_bn_affine`); each b_i is [C_out_i] or [1, C_out_i].

    block_b=None auto-sizes the batch block to the VMEM budget: the widest
    live activation is c_max x (block_b*N), and block_b=64 at the headline
    shape (N=1024, c_max=128, bf16) is the measured sweet spot (0.71 ms vs
    2.33 ms for the XLA path at B=1024) right under the 16 MB scoped-vmem
    limit; the formula scales that operating point to other shapes.
    """
    n_layers = len(weights_and_biases) // 2
    if interpret:
        bf16 = False  # CPU interpreter has no bf16xbf16=f32 dot
    if block_b is None:
        n = x.shape[1]
        c_max = max(w.shape[-1] for w in weights_and_biases[0::2])
        lanes = (65536 * 128) // (max(n, 1) * max(c_max, 1))
        if not bf16:
            lanes //= 2
        block_b = max(8, min(64, 1 << max(0, lanes.bit_length() - 1)))
    xt = jnp.swapaxes(x, 1, 2)             # [B, C_in, N] channel-major
    wbs = []
    for i in range(n_layers):
        w = weights_and_biases[2 * i]
        bias = weights_and_biases[2 * i + 1]
        wbs.append(jnp.asarray(w, jnp.float32).T)
        wbs.append(jnp.asarray(bias, jnp.float32).reshape(-1, 1))
    return _cp_for(n_layers)(xt, *wbs, block_b, bf16, interpret)
