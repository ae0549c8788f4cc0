"""Point-cloud augmentations.

Behavioural parity with classification/provider.py:35-141 (rotation about the
up/Y axis, clipped gaussian jitter, noise replacement) and
reconstruction/src/general_utils.py:100-117 (z-rotation + gaussian), but
vectorised over the batch (the reference loops per cloud in python) and
expressed twice: numpy (host input pipeline) and jax (on-device, jittable so
augmentation can fuse into the train step and never touch the host).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- numpy side

def rotation_matrix_y(angle: np.ndarray) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    zeros, ones = np.zeros_like(c), np.ones_like(c)
    return np.stack(
        [np.stack([c, zeros, s], -1),
         np.stack([zeros, ones, zeros], -1),
         np.stack([-s, zeros, c], -1)], axis=-2)


def rotate_point_cloud(batch: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Random per-cloud rotation about the up (Y) axis."""
    angles = rng.uniform(size=batch.shape[0]) * 2 * np.pi
    rot = rotation_matrix_y(angles)
    return np.einsum("bnc,bcd->bnd", batch, rot).astype(np.float32)


def rotate_point_cloud_by_angle(batch: np.ndarray, angle: float) -> np.ndarray:
    rot = rotation_matrix_y(np.asarray(angle))
    return np.einsum("bnc,cd->bnd", batch, rot).astype(np.float32)


def jitter_point_cloud(
    batch: np.ndarray, rng: np.random.RandomState,
    sigma: float = 0.01, clip: float = 0.05,
) -> np.ndarray:
    noise = np.clip(sigma * rng.randn(*batch.shape), -clip, clip)
    return (batch + noise).astype(np.float32)


def noisy_point_cloud(
    batch: np.ndarray, rng: np.random.RandomState, ratio: float = 0.1
) -> np.ndarray:
    """Replace a random `ratio` of point slots with uniform [-1,1] noise."""
    b, n, c = batch.shape
    out = batch.copy()
    idx = rng.permutation(n)[: int(n * ratio)]
    out[:, idx, :] = rng.rand(b, len(idx), c) * 2 - 1
    return out.astype(np.float32)


def random_scale(batch: np.ndarray, rng: np.random.RandomState,
                 lo: float = 0.8, hi: float = 1.25) -> np.ndarray:
    s = rng.uniform(lo, hi, size=(batch.shape[0], 1, 1))
    return (batch * s).astype(np.float32)


# ------------------------------------------------------------------ jax side

def rotate_y_jax(key: jax.Array, batch: jax.Array) -> jax.Array:
    angles = jax.random.uniform(key, (batch.shape[0],)) * 2 * jnp.pi
    c, s = jnp.cos(angles), jnp.sin(angles)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    rot = jnp.stack(
        [jnp.stack([c, z, s], -1),
         jnp.stack([z, o, z], -1),
         jnp.stack([-s, z, c], -1)], axis=-2)
    return jnp.einsum("bnc,bcd->bnd", batch, rot)


def jitter_jax(key: jax.Array, batch: jax.Array,
               sigma: float = 0.01, clip: float = 0.05) -> jax.Array:
    noise = jnp.clip(sigma * jax.random.normal(key, batch.shape), -clip, clip)
    return batch + noise


def augment_for_classification(key: jax.Array, batch: jax.Array) -> jax.Array:
    """The reference's train-time combo: rotate then jitter
    (classification/train_samplenet.py:289-293), fully on-device."""
    k1, k2 = jax.random.split(key)
    return jitter_jax(k2, rotate_y_jax(k1, batch))
