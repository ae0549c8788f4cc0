"""Shared neural building blocks.

The reference builds per-point feature extractors out of 1x1 convolutions
(torch Conv1d(k=1) in registration/src/samplenet.py:40-44; TF conv2d with
[1,1] kernels via classification/utils/tf_util.py:115-184; tflearn conv1d in
reconstruction/src/encoders_decoders.py:24-131). A 1x1 conv over points IS a
per-point matmul, so here it is a Dense layer over the channel axis of
[B, N, C] — the [B*N, C] x [C, C'] contraction rides the MXU directly with no
im2col or layout games.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class BNTrainStats(nn.Module):
    """BatchNorm parameter/statistics holder for externally-fused layers.

    Variable tree is identical to `nn.BatchNorm` (params {scale, bias},
    batch_stats {mean, var}) so checkpoints are interchangeable with the
    XLA chain, but normalisation itself happens inside a fused kernel:
    `affine()` hands the kernel its scale/bias (gradients flow through
    them), `update(mean, var)` applies flax's exact running-average rule
    to the kernel's reported batch statistics.
    """

    features: int
    momentum: float = 0.9

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.features,))
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,))
        self.mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,)))
        self.var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,)))

    def affine(self):
        return self.scale, self.bias

    def update(self, mean, var):
        m = self.momentum
        self.mean.value = m * self.mean.value + (1 - m) * mean
        self.var.value = m * self.var.value + (1 - m) * var


class PointMLP(nn.Module):
    """Per-point MLP: Dense -> (BatchNorm) -> activation over [B, N, C].

    Equivalent to a stack of 1x1 convs with BN+ReLU. BatchNorm statistics are
    computed over (batch, points) like torch BatchNorm1d on [B, C, N] /
    tf_util.conv2d's batch_norm_for_conv2d.
    """

    features: Sequence[int]
    use_bn: bool = True
    bn_momentum: float = 0.9
    activate_final: bool = True
    # compute dtype: bf16 halves MXU time; params stay f32 (flax casts
    # activations/weights per-op and accumulates in f32 via XLA defaults)
    dtype: Any = None
    # fused eval kernel for __call__(pool_max=True): the whole chain + max
    # runs in one VMEM pass (ops/pallas/point_mlp_kernel.py; 3.3x the XLA
    # path at the headline eval shape). None = auto: on for TPU backends.
    use_pallas: bool | None = None
    # fused TRAIN kernel for __call__(pool_max=True, training=True).
    # None (default) = AUTO: on TPU backends, run the EXACT-BN fused
    # kernel (ops/pallas/point_mlp_exact_kernel.py — loss/grads/EMA match
    # the XLA chain bit-for-bit up to f32 reassociation, measured 1.76x at
    # the headline train shape) whenever the shapes allow; elsewhere, or
    # when they don't, the XLA chain. True = force the `fused_mode`
    # variant (--fused-train: ghost-BN, the fastest — a principled
    # semantic change, statistics per batch-block like torch multi-GPU
    # data parallelism, measured ~1-2 pts acc cost). False = force the
    # XLA chain.
    fused_train: bool | None = None
    # fused-train variant when fused_train=True: "ghost" (block-local
    # statistics, fastest) or "exact" (two-stage exact global statistics —
    # loss/grads/EMA match the XLA chain).
    fused_mode: str = "ghost"
    # in-kernel matmul precision for the fused train chain. None = the
    # mode default (ghost: bf16 — its published 2.3x number; exact: f32 —
    # drop-in for the quality-default path).
    fused_bf16: bool | None = None
    # activation layout for the XLA path. "bnc" (default) keeps [B, N, C]
    # rows — at C=64 each f32 row fills half a 128-lane tile, doubling the
    # effective HBM traffic of the training chain. "bcn" computes the
    # chain channel-major ([B, C, N], N on the lanes, einsum matmuls +
    # BatchNorm(axis=1)) with an IDENTICAL param tree, trading one entry
    # transpose for full-lane activations.
    layout: str = "bnc"

    def _fused_ok(self, x, training, pool_max) -> bool:
        if not pool_max or training or not self.use_bn \
                or not self.activate_final or self.dtype is not None \
                or x.ndim != 3:
            return False
        if self.use_pallas is not None:
            return self.use_pallas
        from samplenet_tpu.ops.dispatch import pallas_backend_ok

        return pallas_backend_ok() and x.shape[1] >= 128

    def _fused_bf16(self, mode: str) -> bool:
        if self.fused_bf16 is not None:
            return self.fused_bf16
        return mode == "ghost"

    def _resolve_fused_mode(self, x, training, pool_max) -> str | None:
        """The fused-train variant to run, or None for the XLA chain."""
        if self.fused_train is False or not pool_max or not training \
                or not self.use_bn or not self.activate_final \
                or self.dtype is not None or x.ndim != 3 \
                or x.shape[1] % 128:
            return None
        if self.fused_train is None:
            # auto: exact-BN only — a pure speedup at loss parity, like
            # the auto eval kernel; ghost stays behind the explicit flag.
            from samplenet_tpu.ops.dispatch import pallas_backend_ok

            if not pallas_backend_ok():
                return None
            mode = "exact"
        else:
            mode = self.fused_mode
        if mode == "exact":
            from samplenet_tpu.ops.pallas.point_mlp_exact_kernel import (
                auto_block_b_exact,
            )

            ok = len(self.features) >= 2 and auto_block_b_exact(
                x.shape[0], x.shape[1], tuple(self.features),
                self._fused_bf16(mode)) is not None
            return "exact" if ok else None
        from samplenet_tpu.ops.pallas.point_mlp_train_kernel import (
            auto_block_b,
        )

        ok = auto_block_b(
            x.shape[0], x.shape[1], tuple(self.features),
            self._fused_bf16(mode)) is not None
        return mode if ok else None

    def _call_fused_train(self, x: jnp.ndarray, mode: str) -> jnp.ndarray:
        """Fused train chain + global max (VMEM passes fwd and bwd) —
        ghost-BN or exact-BN per `mode`. Dense/BN param trees match
        the XLA path exactly; running averages get the exact global batch
        statistics via BNTrainStats either way."""
        from samplenet_tpu.ops.dispatch import pallas_backend_ok

        if mode == "exact":
            from samplenet_tpu.ops.pallas.point_mlp_exact_kernel import (
                point_mlp_exact_train_max as fused_fn,
            )
        else:
            from samplenet_tpu.ops.pallas.point_mlp_train_kernel import (
                point_mlp_train_max as fused_fn,
            )

        ws, dense_bs, gammas, betas, bns = [], [], [], [], []
        h = jnp.zeros((1, 1, x.shape[-1]), jnp.float32)
        for i, f in enumerate(self.features):
            dense = nn.Dense(f, name=f"dense_{i}")
            h = dense(h)  # materialise params; DCE'd under jit
            dp = dense.variables["params"]
            bn = BNTrainStats(features=f, momentum=self.bn_momentum,
                              name=f"bn_{i}")
            gamma, beta = bn.affine()
            ws.append(dp["kernel"])
            dense_bs.append(dp["bias"])
            gammas.append(gamma)
            betas.append(beta)
            bns.append(bn)
        pooled, means, vars_ = fused_fn(
            x, tuple(ws), tuple(dense_bs), tuple(gammas), tuple(betas),
            bf16=self._fused_bf16(mode), interpret=not pallas_backend_ok())
        for bn, mu, var in zip(bns, means, vars_):
            bn.update(mu, var)
        return pooled

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, training: bool = False, pool_max: bool = False
    ) -> jnp.ndarray:
        """Per-point MLP chain; with `pool_max` returns the global max over
        the points axis ([B, C_out]) — at eval on TPU this dispatches the
        fused Pallas kernel (BN folded into each layer's affine, no
        inter-layer HBM traffic)."""
        if self._fused_ok(x, training, pool_max):
            from samplenet_tpu.ops.pallas.point_mlp_kernel import (
                fold_bn_affine,
                point_mlp_max,
            )

            # materialize the (identical) param tree via dummy calls — DCE'd
            # under jit — then read the values off the bound submodules
            wbs = []
            h = jnp.zeros((1, 1, x.shape[-1]), jnp.float32)
            for i, f in enumerate(self.features):
                dense = nn.Dense(f, name=f"dense_{i}")
                h = dense(h)
                bn = nn.BatchNorm(use_running_average=True,
                                  momentum=self.bn_momentum,
                                  name=f"bn_{i}")
                h = bn(h)
                dp = dense.variables["params"]
                bp = bn.variables["params"]
                bs = bn.variables["batch_stats"]
                w, b = fold_bn_affine(dp["kernel"], dp["bias"], bp["scale"],
                                      bp["bias"], bs["mean"], bs["var"])
                wbs += [w, b]
            from samplenet_tpu.ops.dispatch import pallas_backend_ok

            # explicit use_pallas=True off-TPU runs the interpreter (tests)
            return point_mlp_max(x, tuple(wbs),
                                 interpret=not pallas_backend_ok())
        fused_mode = self._resolve_fused_mode(x, training, pool_max)
        if fused_mode is not None:
            return self._call_fused_train(x, fused_mode)
        if self.layout == "bcn" and x.ndim == 3:
            return self._call_bcn(x, training, pool_max)
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"dense_{i}", dtype=self.dtype)(x)
            is_last = i == n - 1
            if self.use_bn and (self.activate_final or not is_last):
                x = nn.BatchNorm(
                    use_running_average=not training,
                    momentum=self.bn_momentum,
                    axis_name=None,
                    name=f"bn_{i}",
                    dtype=self.dtype,
                )(x)
            if self.activate_final or not is_last:
                x = nn.relu(x)
        if pool_max:
            return jnp.max(x, axis=1)
        return x

    def _call_bcn(self, x: jnp.ndarray, training: bool,
                  pool_max: bool) -> jnp.ndarray:
        """Channel-major chain: one [B,N,C]->[B,C,N] transpose, then every
        layer is einsum('co,bcn->bon') with N on the 128-lane axis and
        BatchNorm over axes (0, 2). Param tree identical to the row-major
        path (Dense params materialised via dummy calls, DCE'd under jit)."""
        h = jnp.swapaxes(x, 1, 2)          # [B, C, N]
        n = len(self.features)
        for i, f in enumerate(self.features):
            dense = nn.Dense(f, name=f"dense_{i}", dtype=self.dtype)
            _ = dense(jnp.zeros((1, 1, h.shape[1]), x.dtype))
            w = dense.variables["params"]["kernel"]
            b = dense.variables["params"]["bias"]
            if self.dtype is not None:
                w, b, h = (w.astype(self.dtype), b.astype(self.dtype),
                           h.astype(self.dtype))
            h = jnp.einsum("co,bcn->bon", w, h) + b[None, :, None]
            is_last = i == n - 1
            if self.use_bn and (self.activate_final or not is_last):
                h = nn.BatchNorm(
                    use_running_average=not training,
                    momentum=self.bn_momentum,
                    axis=1,
                    name=f"bn_{i}",
                    dtype=self.dtype,
                )(h)
            if self.activate_final or not is_last:
                h = nn.relu(h)
        if pool_max:
            return jnp.max(h, axis=2)
        return jnp.swapaxes(h, 1, 2)


class MLPHead(nn.Module):
    """Fully-connected head over [B, C] global features.

    BN+activation on every layer except optionally the last (the reference
    sampler FC head applies BN+ReLU on the first three FCs and leaves the
    final coordinate regression linear, samplenet.py:99-102).
    """

    features: Sequence[int]
    use_bn: bool = True
    bn_momentum: float = 0.9
    activate_final: bool = False
    dropout_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"dense_{i}", dtype=self.dtype)(x)
            is_last = i == n - 1
            if not is_last or self.activate_final:
                if self.use_bn:
                    x = nn.BatchNorm(
                        use_running_average=not training,
                        momentum=self.bn_momentum,
                        name=f"bn_{i}",
                        dtype=self.dtype,
                    )(x)
                x = nn.relu(x)
                if self.dropout_rate > 0.0:
                    x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        return x


def mlp_stack(widths: Sequence[int]) -> tuple[int, ...]:
    return tuple(int(w) for w in widths)
