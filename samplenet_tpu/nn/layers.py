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

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
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
        return x


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
