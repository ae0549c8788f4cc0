"""SampleNet: task-aware differentiable point-cloud sampling.

The sampler = simplification network (PointNet-style per-point MLP -> global
max-pool -> FC coordinate regressor) + soft projection (training) or hard
matching (inference). Public API mirrors the reference
registration/src/samplenet.py:22-187 (constructor arguments, forward contract
returning (simplified, projected-or-matched), get_simplification_loss /
get_projection_loss), with two TPU-first differences:

  * everything — including the inference matching path that the reference
    runs per-cloud in numpy on the host (samplenet.py:119-141) — is jittable
    and stays on device with static shapes;
  * layout is [B, N, 3] ("bnc") internally so per-point MLPs are [B*N, C]
    matmuls on the MXU; "bcn" in/out shapes are accepted for API parity.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from samplenet_tpu.models import losses as losses_lib
from samplenet_tpu.models.soft_projection import SoftProjection
from samplenet_tpu.nn.layers import MLPHead, PointMLP
from samplenet_tpu.ops.fps import (
    farthest_point_sample,
    farthest_point_sample_with_points,
    gather_point,
)
from samplenet_tpu.ops.matching import nn_match_from_clouds


def _to_bnc(x: jax.Array, shape: str) -> jax.Array:
    if shape == "bcn":
        return jnp.swapaxes(x, 1, 2)
    return x


def _from_bnc(x: jax.Array, shape: str) -> jax.Array:
    if shape == "bcn":
        return jnp.swapaxes(x, 1, 2)
    return x


class SimplificationNet(nn.Module):
    """PointNet-style regressor emitting `num_out_points` coordinates.

    Conv widths 3->64->64->64->128->bottleneck (BN+ReLU each), global max
    pool, FC 256->256->256->3m with BN+ReLU except the final linear layer
    (registration/src/samplenet.py:40-59,90-104). The reconstruction-track
    variant (reconstruction/src/samplers.py:22-38) uses widths
    [64,128,128,256,128] and no BN in the FC head — selectable via fields.
    """

    num_out_points: int
    bottleneck_size: int = 128
    conv_widths: tuple = (64, 64, 64, 128)
    fc_widths: tuple = (256, 256, 256)
    fc_bn: bool = True
    bn_momentum: float = 0.9
    dtype: Any = None
    conv_layout: str = "bnc"  # "bcn": channel-major training chain
    # fused train kernel for the conv chain (opt-in; see
    # nn/layers.py::PointMLP.fused_train / fused_mode / fused_bf16)
    fused_train: bool | None = None   # None = auto exact-fused on TPU
    fused_mode: str = "ghost"
    fused_bf16: bool | None = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        # pool_max fuses the chain + global max; at eval on TPU it runs the
        # one-VMEM-pass Pallas kernel (84% of the eval forward otherwise)
        global_feat = PointMLP(
            features=(*self.conv_widths, self.bottleneck_size), name="convs",
            bn_momentum=self.bn_momentum, dtype=self.dtype,
            layout=self.conv_layout, fused_train=self.fused_train,
            fused_mode=self.fused_mode, fused_bf16=self.fused_bf16,
        )(x, training=training, pool_max=True)  # [B, bottleneck]
        y = MLPHead(features=self.fc_widths, use_bn=self.fc_bn, name="fcs",
                    bn_momentum=self.bn_momentum, dtype=self.dtype,
                    activate_final=True)(global_feat, training=training)
        y = nn.Dense(3 * self.num_out_points, name="out")(y)
        return y.reshape(-1, self.num_out_points, 3).astype(jnp.float32)


class SampleNet(nn.Module):
    """Differentiable sampler with the reference's constructor surface
    (registration/src/samplenet.py:23-35).

    Call with `training=True` to get (simplified, projected) for loss
    computation; `training=False` returns (simplified, matched) where matched
    is the on-device unique+FPS-completed hard sample.
    """

    num_out_points: int
    bottleneck_size: int = 128
    group_size: int = 7
    initial_temperature: float = 1.0
    is_temperature_trainable: bool = True
    min_sigma: float = 1e-2
    input_shape: str = "bnc"
    output_shape: str = "bnc"
    complete_fps: bool = True
    skip_projection: bool = False
    sigma_mode: str = "torch"
    conv_widths: tuple = (64, 64, 64, 128)
    fc_widths: tuple = (256, 256, 256)
    fc_bn: bool = True
    use_pallas: bool | None = None  # None = auto (TPU on, CPU/GPU off)
    bn_momentum: float = 0.9
    dtype: Any = None
    conv_layout: str = "bnc"  # "bcn": channel-major training chain
    fused_train: bool | None = None   # None = auto exact-fused on TPU
    fused_mode: str = "ghost"
    fused_bf16: bool | None = None

    def setup(self):
        if self.input_shape not in ("bnc", "bcn"):
            raise ValueError("input_shape must be 'bnc' or 'bcn'")
        if self.output_shape not in ("bnc", "bcn"):
            raise ValueError("output_shape must be 'bnc' or 'bcn'")
        self.simplifier = SimplificationNet(
            num_out_points=self.num_out_points,
            bottleneck_size=self.bottleneck_size,
            conv_widths=self.conv_widths,
            fc_widths=self.fc_widths,
            fc_bn=self.fc_bn,
            bn_momentum=self.bn_momentum,
            dtype=self.dtype,
            conv_layout=self.conv_layout,
            fused_train=self.fused_train,
            fused_mode=self.fused_mode,
            fused_bf16=self.fused_bf16,
        )
        self.project = SoftProjection(
            group_size=self.group_size,
            initial_temperature=self.initial_temperature,
            is_temperature_trainable=self.is_temperature_trainable,
            min_sigma=self.min_sigma,
            sigma_mode=self.sigma_mode,
            use_pallas=self.use_pallas,
        )

    def __call__(
        self, x: jax.Array, training: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        """Returns (simplified, sampled) in `output_shape` layout.

        training=True  -> sampled = soft-projected points (differentiable)
        training=False -> sampled = hard-matched points (unique + FPS
                          completion, all on device; samplenet.py:119-141)
        """
        x = _to_bnc(x, self.input_shape)
        simp = self.simplifier(x, training=training)
        # touch the projector so its temperature param exists regardless of
        # the branch taken (eval-mode init would otherwise never create it)
        self.project.sigma()

        if training:
            if self.skip_projection:
                out = simp
            else:
                out, _, _ = self.project.project(x, simp)
        else:
            out, _ = nn_match_from_clouds(
                x, simp, self.num_out_points, complete_fps=self.complete_fps
            )

        return _from_bnc(simp, self.output_shape), _from_bnc(out, self.output_shape)

    def simplify(self, x: jax.Array, training: bool = False) -> jax.Array:
        """Simplified cloud only (no projection/matching)."""
        x = _to_bnc(x, self.input_shape)
        return _from_bnc(self.simplifier(x, training=training), self.output_shape)

    def sigma(self) -> jax.Array:
        return self.project.sigma()

    def get_simplification_loss(
        self,
        ref_pc: jax.Array,
        samp_pc: jax.Array,
        pc_size: int,
        gamma: float = 1.0,
        delta: float = 0.0,
        training: bool = True,
    ) -> jax.Array:
        """Zero at inference / skip_projection (samplenet.py:171-181);
        clouds must be [B, N, 3]."""
        if self.skip_projection or not training:
            return jnp.asarray(0.0)
        return losses_lib.simplification_loss(ref_pc, samp_pc, pc_size, gamma, delta)

    def get_projection_loss(self, training: bool = True) -> jax.Array:
        if self.skip_projection or not training:
            return jnp.asarray(0.0)
        return losses_lib.projection_loss(self.project.sigma())


class FPSSampler(nn.Module):
    """Non-learned farthest-point-sampling baseline with the SampleNet call
    contract (registration/src/fps.py:8-43: random start point when
    `permute`, then greedy FPS)."""

    num_out_points: int
    permute: bool = True
    input_shape: str = "bnc"
    output_shape: str = "bnc"

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False):
        x = _to_bnc(x, self.input_shape)
        b, n, _ = x.shape
        if self.permute:
            rng = self.make_rng("sampler")
            start = jax.random.randint(rng, (b,), 0, n)
        else:
            start = 0
        _, y = farthest_point_sample_with_points(
            self.num_out_points, x, start_idx=start)
        y = _from_bnc(y, self.output_shape)
        return y, y

    def get_simplification_loss(self, *a: Any, **k: Any) -> jax.Array:
        return jnp.asarray(0.0)

    def get_projection_loss(self, *a: Any, **k: Any) -> jax.Array:
        return jnp.asarray(0.0)


class RandomSampler(nn.Module):
    """Uniform random sampling baseline (registration/src/random_sampling.py).
    Samples WITHOUT replacement like the reference's randperm — with
    replacement, ~86% of 64-of-1024 draws contain duplicates (birthday
    bound), silently weakening the baseline."""

    num_out_points: int
    input_shape: str = "bnc"
    output_shape: str = "bnc"

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False):
        x = _to_bnc(x, self.input_shape)
        b, n, _ = x.shape
        rng = self.make_rng("sampler")
        # top-k of iid uniform keys = a uniform m-subset without
        # replacement (the first-m-of-a-randperm distribution over SETS;
        # output order is key-sorted, irrelevant to the permutation-
        # invariant consumers). A full [B, N] argsort serializes on TPU.
        keys = jax.random.uniform(rng, (b, n))
        _, idx = jax.lax.top_k(keys, self.num_out_points)
        idx = idx.astype(jnp.int32)
        y = gather_point(x, idx)
        y = _from_bnc(y, self.output_shape)
        return y, y

    def get_simplification_loss(self, *a: Any, **k: Any) -> jax.Array:
        return jnp.asarray(0.0)

    def get_projection_loss(self, *a: Any, **k: Any) -> jax.Array:
        return jnp.asarray(0.0)
