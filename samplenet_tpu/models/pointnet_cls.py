"""PointNet classifiers: vanilla and T-net (spatial/feature transform) variants.

Parity targets: classification/models/pointnet_cls_basic.py:55-145 (vanilla:
per-point MLP 64-64-64-128-1024 with BN, global max-pool, FC 512-256 + dropout
0.3, 40-way head) and pointnet_cls.py:21-132 + transform_nets.py (full: input
3x3 and feature 64x64 transform nets with identity-initialised regressors, and
the orthogonality regulariser ||T T^t - I||^2 / 2 * reg_weight).

TPU notes: the reference's conv2d-[1,3]-on-image trick exists only to express
a per-point matmul in TF graph mode — here every "conv" is a Dense over the
channel axis of [B, N, C], which XLA maps straight onto the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from samplenet_tpu.nn.layers import PointMLP


class TransformNet(nn.Module):
    """T-net: regresses a KxK transform, identity at initialisation
    (transform_nets.py:12-80: zero-init weights + identity bias)."""

    k: int
    bn_momentum: float = 0.9
    dtype: Any = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False) -> jax.Array:
        feats = PointMLP(features=(64, 128, 1024), name="convs",
                         bn_momentum=self.bn_momentum,
                         dtype=self.dtype)(x, training=training)
        g = jnp.max(feats, axis=1)
        for i, w in enumerate((512, 256)):
            g = nn.Dense(w, name=f"fc_{i}", dtype=self.dtype)(g)
            g = nn.BatchNorm(use_running_average=not training,
                             momentum=self.bn_momentum, name=f"bn_{i}",
                             dtype=self.dtype)(g)
            g = nn.relu(g)
        mat = nn.Dense(
            self.k * self.k,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *a: jnp.eye(self.k).reshape(-1),
            name="transform",
        )(g)
        return mat.reshape(-1, self.k, self.k)


class PointNetClassifier(nn.Module):
    """PointNet classifier over [B, N, 3] clouds -> [B, num_classes] logits.

    use_tnets=False gives the 'basic' variant (the frozen task network used
    in the SampleNet classification pipeline, runner_samplenet.sh); True adds
    input/feature transforms and returns the 64x64 transform in end_points
    for the orthogonality loss.
    """

    num_classes: int = 40
    use_tnets: bool = False
    bn_momentum: float = 0.9
    dropout_rate: float = 0.3
    dtype: Any = None  # compute dtype (e.g. bf16); params stay f32

    @nn.compact
    def __call__(
        self, x: jax.Array, training: bool = False
    ) -> tuple[jax.Array, dict]:
        end_points: dict = {}

        if self.use_tnets:
            t_in = TransformNet(k=3, name="tnet_input",
                                dtype=self.dtype)(x, training=training)
            x = jnp.einsum("bnc,bcd->bnd", x, t_in)
            x = PointMLP(features=(64, 64), name="convs_a",
                         bn_momentum=self.bn_momentum,
                         dtype=self.dtype)(x, training=training)
            t_feat = TransformNet(k=64, name="tnet_feature",
                                  dtype=self.dtype)(x, training=training)
            end_points["transform"] = t_feat
            x = jnp.einsum("bnc,bcd->bnd", x, t_feat)
            x = PointMLP(features=(64, 128, 1024), name="convs_b",
                         bn_momentum=self.bn_momentum,
                         dtype=self.dtype)(x, training=training)
        else:
            x = PointMLP(features=(64, 64, 64, 128, 1024), name="convs",
                         bn_momentum=self.bn_momentum,
                         dtype=self.dtype)(x, training=training)

        end_points["critical_set_idx"] = jnp.argmax(x, axis=1)
        g = jnp.max(x, axis=1)  # [B, 1024] global feature
        end_points["GFV"] = g

        g = nn.Dense(512, name="fc1", dtype=self.dtype)(g)
        g = nn.BatchNorm(use_running_average=not training,
                         momentum=self.bn_momentum, name="bn_fc1",
                         dtype=self.dtype)(g)
        g = nn.relu(g)
        if self.use_tnets:
            g = nn.Dropout(self.dropout_rate, deterministic=not training)(g)
        g = nn.Dense(256, name="fc2", dtype=self.dtype)(g)
        g = nn.BatchNorm(use_running_average=not training,
                         momentum=self.bn_momentum, name="bn_fc2",
                         dtype=self.dtype)(g)
        g = nn.relu(g)
        end_points["retrieval_vectors"] = g
        g = nn.Dropout(self.dropout_rate, deterministic=not training)(g)
        # final logits in f32 for a stable softmax
        logits = nn.Dense(self.num_classes, name="fc3")(
            g.astype(jnp.float32))
        return logits, end_points


def classification_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean sparse softmax cross-entropy (pointnet_cls_basic.py:139-145)."""
    logp = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    return jnp.mean(nll)


def matrix_regularization_loss(transform: jax.Array) -> jax.Array:
    """||T T^t - I||_F^2 / 2 (tf l2_loss semantics, pointnet_cls.py:117-132)."""
    k = transform.shape[-1]
    tt = jnp.einsum("bij,bkj->bik", transform, transform)
    diff = tt - jnp.eye(k, dtype=transform.dtype)
    return 0.5 * jnp.sum(diff**2)


def pointnet_loss(
    logits: jax.Array,
    labels: jax.Array,
    end_points: dict,
    reg_weight: float = 0.001,
) -> jax.Array:
    loss = classification_loss(logits, labels)
    if "transform" in end_points:
        loss = loss + reg_weight * matrix_regularization_loss(
            end_points["transform"]
        )
    return loss
