"""Fused per-point encoder Pallas kernel (eval path).

Every task network in this framework starts with the same hot block: a chain
of per-point Dense layers (the reference's 1x1 convs) + BN + ReLU, closed by
a global max-pool (SampleNet simplifier, PointNet classifier, AE encoder,
PCRNet features). In XLA each layer's [B*N, C] activation round-trips HBM
between matmuls — ~1.9 GB per forward at [1024, 1024, 128]. This kernel runs
the whole chain chunk-by-chunk in VMEM (weights stay resident — ~130 KB for
the standard widths) and reduces the max on the fly, so HBM sees the input
points once and the [B, C_out] features once.

Inference-only: eval-mode BatchNorm is an affine map and is FOLDED into the
Dense weights beforehand (`fold_bn_params`); training keeps the XLA path
(BN batch statistics need the full activations anyway).

MEASURED NEGATIVE RESULT (round 1, v5e, B=1024 N=1024): XLA's own fusion
already keeps this chain at 3.3 ms/batch; this kernel reaches 3.5 ms with
single-pass bf16 matmuls and 8.0 ms at full f32 (multi-pass), so the XLA
path remains the default everywhere. Note Mosaic does not appear to honour
precision=HIGHEST for in-kernel dot_general (feature error stays ~1e-2).
Kept as infrastructure + regression baseline for future Mosaic versions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn_params(params: dict, num_layers: int, *, eps: float = 1e-5,
                   batch_stats: dict | None = None) -> list[tuple]:
    """Fold eval-mode BatchNorm into Dense (W, b) pairs.

    Takes a PointMLP param subtree ({dense_i: {kernel, bias}, bn_i: {...}})
    plus its batch_stats; returns [(W', b'), ...] with
    W' = W * s, b' = (b - mean) * s + beta, s = gamma / sqrt(var + eps).
    Layers without a bn_i entry pass through unchanged.
    """
    folded = []
    for i in range(num_layers):
        dense = params[f"dense_{i}"]
        w = jnp.asarray(dense["kernel"], jnp.float32)
        b = jnp.asarray(dense["bias"], jnp.float32)
        bn_key = f"bn_{i}"
        if bn_key in params:
            if not batch_stats or bn_key not in batch_stats:
                raise ValueError(
                    f"folding {bn_key} requires its running batch_stats")
            gamma = jnp.asarray(params[bn_key]["scale"], jnp.float32)
            beta = jnp.asarray(params[bn_key]["bias"], jnp.float32)
            stats = batch_stats[bn_key]
            mean = jnp.asarray(stats["mean"], jnp.float32)
            var = jnp.asarray(stats["var"], jnp.float32)
            s = gamma * jax.lax.rsqrt(var + eps)
            w = w * s[None, :]
            b = (b - mean) * s + beta
        folded.append((w, b))
    return folded


def _encoder_kernel(pts_ref, *args, n: int, block_b: int, chunk: int,
                    widths: tuple, precision):
    """args = (w_0, b_0, ..., w_L, b_L, out_ref). Processes block_b clouds
    per program in N-chunks: [BB*chunk, C] matmuls keep the MXU busy while
    activations stay within the VMEM stack budget."""
    num_layers = len(widths)
    weights = args[: 2 * num_layers]
    out_ref = args[2 * num_layers]

    acc = jnp.full((block_b, widths[-1]), -jnp.inf, jnp.float32)
    for c in range(n // chunk):
        x = pts_ref[:, c * chunk : (c + 1) * chunk, :].reshape(
            block_b * chunk, 3)
        for li in range(num_layers):
            w = weights[2 * li][:, :]
            b = weights[2 * li + 1][0, :]
            x = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) + b[None, :]
            x = jnp.maximum(x, 0.0)  # all encoder layers are BN+ReLU
        feats = x.reshape(block_b, chunk, widths[-1])
        acc = jnp.maximum(acc, jnp.max(feats, axis=1))
    out_ref[:, 0, :] = acc


@functools.partial(jax.jit,
                   static_argnames=("block_b", "fast_math", "interpret"))
def fused_point_encoder(
    points: jax.Array,            # [B, N, 3]
    folded: tuple,                # tuple of (W, b) pairs, BN pre-folded
    *,
    block_b: int = 8,
    fast_math: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Fused Dense-chain + ReLU + global max-pool. Returns [B, C_out].

    fast_math=True lets the MXU run single-pass bf16 matmuls (~1e-2 feature
    error, fine for serving); default is full f32 precision."""
    b, n, _ = points.shape
    widths = tuple(int(w.shape[1]) for w, _ in folded)
    pts = points.astype(jnp.float32)
    bb = min(block_b, b)
    pad_b = (-b) % bb
    if pad_b:
        pts = jnp.concatenate([pts, jnp.repeat(pts[:1], pad_b, axis=0)])
    bp = b + pad_b
    chunk = min(256, n)
    pad_n = (-n) % chunk
    if pad_n:
        pts = jnp.concatenate(
            [pts, jnp.repeat(pts[:, :1], pad_n, axis=1)], axis=1)
    np_ = n + pad_n

    flat_args = []
    in_specs = [pl.BlockSpec((bb, np_, 3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    for w, bias in folded:
        flat_args.append(jnp.asarray(w, jnp.float32))
        flat_args.append(jnp.asarray(bias, jnp.float32)[None, :])
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, bias.shape[0]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    import jax.lax as lax

    precision = (lax.Precision.DEFAULT if fast_math
                 else lax.Precision.HIGHEST)
    kernel = functools.partial(_encoder_kernel, n=np_, block_b=bb,
                               chunk=chunk, widths=widths,
                               precision=precision)
    out = pl.pallas_call(
        kernel,
        grid=(bp // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, 1, widths[-1]), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 1, widths[-1]), jnp.float32),
        interpret=interpret,
    )(pts, *flat_args)
    return out[:b, 0]
