"""PCRNet: siamese PointNet features -> FC head -> 7-dof twist.

Parity with registration/models/pcrnet.py:8-83: shared per-point MLP
3-64-64-64-128-bottleneck (ReLU, NO batch norm), global max-pool per cloud,
concatenated template+source features through FC 1024-1024-512-512-256-7,
quaternion part L2-normalised (the pre-normalised quat is returned for the
QuaterNet norm regulariser, main.py:566).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from samplenet_tpu.nn.layers import PointMLP


class PointNetFeatures(nn.Module):
    bottleneck_size: int = 1024

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        feats = PointMLP(
            features=(64, 64, 64, 128, self.bottleneck_size),
            use_bn=False,
            name="convs",
        )(x, training=False)
        return jnp.max(feats, axis=1)


class PCRNet(nn.Module):
    bottleneck_size: int = 1024

    @nn.compact
    def __call__(
        self, x0: jax.Array, x1: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """x0 template, x1 source: both [B, N, 3].

        Returns (twist [B, 7] with unit quaternion, pre_normalized_quat).
        """
        feat = PointNetFeatures(self.bottleneck_size, name="feat")
        y = jnp.concatenate([feat(x0), feat(x1)], axis=-1)
        for i, w in enumerate((1024, 1024, 512, 512, 256)):
            y = nn.relu(nn.Dense(w, name=f"fc_{i}")(y))
        y = nn.Dense(7, name="twist")(y)
        pre_quat = y[:, 0:4]
        quat = pre_quat / jnp.maximum(
            jnp.linalg.norm(pre_quat, axis=-1, keepdims=True), 1e-12
        )
        twist = jnp.concatenate([quat, y[:, 4:]], axis=-1)
        return twist, pre_quat
