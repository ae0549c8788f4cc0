"""Point-cloud autoencoder (reconstruction track task network).

Parity with reconstruction/src/ae_templates.py:11-43 ("ala ICLR-18"):
encoder = per-point MLP [64,128,128,256,bottleneck] (BN+ReLU) + max-pool
symmetry; decoder = FC [256,256,N*3] without BN; chamfer or approximate-EMD
reconstruction loss (pointnet_ae.py:116-133). Optional FPS front-end
(pointnet_ae.py:46-56) and FPS-sorted output (:69-76) are provided as
methods so the trainer composes them on device.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from samplenet_tpu.nn.layers import PointMLP
from samplenet_tpu.ops.chamfer import nn_distance
from samplenet_tpu.ops.fps import (
    farthest_point_sample,
    farthest_point_sample_with_points,
    gather_point,
)
from samplenet_tpu.ops.matching import approx_match, match_cost
from samplenet_tpu.ops.pairwise import pairwise_sqdist


class PointNetAE(nn.Module):
    num_output_points: int
    bottleneck_size: int = 128
    encoder_widths: tuple = (64, 128, 128, 256)
    decoder_widths: tuple = (256, 256)
    use_bn: bool = True
    # fused Pallas kernel for the train-mode encoder chain (ghost or
    # exact BN; see nn/layers.py::PointMLP.fused_train / fused_mode)
    fused_train: bool | None = None   # None = auto exact-fused on TPU
    fused_mode: str = "ghost"
    fused_bf16: bool | None = None

    def setup(self):
        self.encoder_mlp = PointMLP(
            features=(*self.encoder_widths, self.bottleneck_size),
            use_bn=self.use_bn,
            fused_train=self.fused_train,
            fused_mode=self.fused_mode,
            fused_bf16=self.fused_bf16,
            name="encoder",
        )
        self.decoder_layers = [
            nn.Dense(w, name=f"dec_{i}") for i, w in enumerate(self.decoder_widths)
        ]
        self.out_layer = nn.Dense(3 * self.num_output_points, name="dec_out")

    def encode(self, x: jax.Array, training: bool = False) -> jax.Array:
        """[B, N, 3] -> [B, bottleneck] global latent.

        pool_max=True lets PointMLP dispatch the fused eval kernel (BN
        folded to affines) on TPU and, with `fused_train`, the ghost-BN
        train kernel; off-TPU it is exactly chain + max over points."""
        return self.encoder_mlp(x, training=training, pool_max=True)

    def decode(self, z: jax.Array) -> jax.Array:
        """[B, bottleneck] -> [B, num_output_points, 3]."""
        for layer in self.decoder_layers:
            z = nn.relu(layer(z))
        out = self.out_layer(z)
        return out.reshape(-1, self.num_output_points, 3)

    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        return self.decode(self.encode(x, training=training))

    @staticmethod
    def sort_output(x_reconstr: jax.Array) -> jax.Array:
        """FPS-ordered reconstruction (pointnet_ae.py:69-76)."""
        _, y = farthest_point_sample_with_points(
            x_reconstr.shape[1], x_reconstr)
        return y


def ae_chamfer_loss(x_reconstr: jax.Array, gt: jax.Array) -> jax.Array:
    """mean CD both directions (pointnet_ae.py:118-124)."""
    c12, _, c21, _ = nn_distance(x_reconstr, gt)
    return jnp.mean(c12) + jnp.mean(c21)


def ae_emd_loss(
    x_reconstr: jax.Array,
    gt: jax.Array,
    *,
    fast_math: bool = False,
    use_pallas: bool | None = None,
) -> jax.Array:
    """mean approx-EMD (pointnet_ae.py:125-133). On TPU this runs the fused
    Pallas kernel (match + cost + analytic grads in one pass, no [B, n, m]
    buffer anywhere — ops/pallas/emd_kernel.py); fast_math only affects the
    XLA fallback (bf16 match levels: 2.15x at 2048^2, <0.2% cost error —
    the kernel has no HBM level traffic to halve). use_pallas=False pins
    the XLA scan (quality A/Bs and seed studies that must share one
    program across backends)."""
    from samplenet_tpu.ops.matching import approx_emd_cost

    return jnp.mean(approx_emd_cost(x_reconstr, gt, fast_math=fast_math,
                                    use_pallas=use_pallas))


def ae_soft_assignment_loss(
    x_reconstr: jax.Array,
    gt: jax.Array,
    *,
    tau_scale: float = 1.0,
    tau_floor: float = 1e-4,
) -> jax.Array:
    """Soft-assignment matching loss (beyond the reference's loss menu;
    inspired by the APML line of work, PAPERS.md — this is our TPU-native
    formulation, not a port of the paper's CUDA kernels).

    Replaces chamfer's hard per-point min with a temperature-controlled
    softmin over the full pairwise distance matrix, in both directions:

        softmin_j D_ij = sum_j softmax_j(-D_ij / tau) * D_ij

    The temperature is ADAPTIVE per cloud and direction: tau = tau_scale *
    stop_grad(mean_i min_j D_ij) + tau_floor, so the assignment stays soft
    (many correspondences share gradient — robust to outliers/noise) while
    reconstructions are far from the target, and sharpens toward plain
    chamfer as the fit improves. The whole loss is one batched matmul
    (MXU) + two softmaxes — the attention-shaped computation TPUs are
    built for; no scatter/gather kernels.
    """
    d = pairwise_sqdist(x_reconstr, gt)                    # [B, n, m]
    tau_r = jax.lax.stop_gradient(
        jnp.mean(jnp.min(d, axis=2), axis=1))              # [B]
    tau_c = jax.lax.stop_gradient(
        jnp.mean(jnp.min(d, axis=1), axis=1))              # [B]
    tau_r = tau_scale * tau_r[:, None, None] + tau_floor
    tau_c = tau_scale * tau_c[:, None, None] + tau_floor
    w_r = jax.nn.softmax(-d / tau_r, axis=2)
    w_c = jax.nn.softmax(-d / tau_c, axis=1)
    soft_r = jnp.sum(w_r * d, axis=2)                      # [B, n]
    soft_c = jnp.sum(w_c * d, axis=1)                      # [B, m]
    return jnp.mean(soft_r) + jnp.mean(soft_c)


def ae_per_cloud_chamfer(x_reconstr: jax.Array, gt: jax.Array) -> jax.Array:
    """[B] per-cloud chamfer (autoencoder.py nn_distance, used for NRE)."""
    c12, _, c21, _ = nn_distance(x_reconstr, gt)
    return jnp.mean(c12, axis=1) + jnp.mean(c21, axis=1)


class ConvDecoder(nn.Module):
    """Per-point conv (1x1) decoder variant
    (reconstruction/src/encoders_decoders.py:260+ decoder_with_convs_only):
    the latent is broadcast to `num_output_points` slots and refined by a
    per-point MLP ending in 3 coordinates. Library-surface parity; the
    canonical AE uses the FC decoder."""

    num_output_points: int
    widths: tuple = (256, 128)
    use_bn: bool = True

    @nn.compact
    def __call__(self, z: jax.Array, training: bool = False) -> jax.Array:
        b, d = z.shape
        seed = nn.Dense(self.num_output_points * (d // 4), name="expand")(z)
        x = seed.reshape(b, self.num_output_points, d // 4)
        x = PointMLP(features=self.widths, use_bn=self.use_bn,
                     name="convs")(x, training=training)
        x = nn.Dense(3, name="out")(x)
        return x
