"""Rigid-transform utilities: 7-dof (quaternion + translation) transforms and
error metrics for the registration track.

Parity with registration/src/qdataset.py:16-130: QuaternionTransform over
[B, 7] twist vectors, inverse (conjugate quat, negated translation), batched
point rotation, and the three evaluation errors — the PCN rotation error
2*acos(2<q1,q2>^2 - 1) (qdataset.py:85), the deviation-from-identity norm
error ||R1 R2^T - I||_F^2 (qdataset.py:87-91), and mean |t1 - t2|.

Here a transform is an immutable pytree (registered dataclass), so it passes
through jit/vmap/grad boundaries without host sync.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from samplenet_tpu.geometry import quaternion as Q


def deg_to_rad(deg):
    return np.pi / 180 * deg


def rad_to_deg(rad):
    return 180 / np.pi * rad


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class QuaternionTransform:
    """[B, 7] twist: 4 quaternion (wxyz) + 3 translation components."""

    vec: jax.Array
    inversion: bool = False

    def tree_flatten(self):
        return (self.vec,), self.inversion

    @classmethod
    def tree_unflatten(cls, inversion, children):
        return cls(children[0], inversion)

    @property
    def quat(self) -> jax.Array:
        return self.vec[..., 0:4]

    @property
    def trans(self) -> jax.Array:
        return self.vec[..., 4:7]

    def inverse(self) -> "QuaternionTransform":
        vec = jnp.concatenate([Q.qinv(self.quat), -self.trans], axis=-1)
        return QuaternionTransform(vec, inversion=not self.inversion)

    def rotate(self, p: jax.Array) -> jax.Array:
        """Rotate [B, N, 3] points (or [N, 3] with a single transform)."""
        if p.ndim == 2:
            q = jnp.broadcast_to(self.quat.reshape(-1)[None, :4], (p.shape[0], 4))
            return Q.qrot(q, p)
        q = jnp.broadcast_to(self.quat[:, None, :], (*p.shape[:2], 4))
        return Q.qrot(q, p)

    def apply(self, p: jax.Array) -> jax.Array:
        """Full rigid transform: rotation then translation (inverse applies
        translation first, matching qdataset.py:17-36)."""
        if self.inversion:
            return self.rotate(p + self.trans[:, None, :])
        return self.rotate(p) + self.trans[:, None, :]

    def rotation_errors(self, other: "QuaternionTransform") -> jax.Array:
        """Per-sample PCN rotation errors [B] in radians (no batch mean) —
        evaluation protocols need per-SAMPLE errors for precision curves;
        batch-meaning first (compute_errors) inflates AUC near failures."""
        dot = jnp.sum(self.quat * other.quat, axis=-1)
        return 2.0 * jnp.arccos(jnp.clip(2.0 * dot**2 - 1.0, -1.0, 1.0))

    def compute_errors(
        self, other: "QuaternionTransform"
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """(rot_err [rad], norm_err, trans_err), each batch-meaned."""
        q1, q2 = self.quat, other.quat
        dot = jnp.sum(q1 * q2, axis=-1)
        rot_err = jnp.mean(
            2.0 * jnp.arccos(jnp.clip(2.0 * dot**2 - 1.0, -1.0, 1.0))
        )
        r1 = Q.quaternion_to_rotation_matrix(q1)
        r2 = Q.quaternion_to_rotation_matrix(q2)
        rel = jnp.einsum("bij,bkj->bik", r1, r2)
        eye = jnp.eye(3, dtype=rel.dtype)
        norm_err = jnp.mean(jnp.sum((rel - eye) ** 2, axis=(1, 2)))
        trans_err = jnp.mean(jnp.sqrt((self.trans - other.trans) ** 2))
        return rot_err, norm_err, trans_err


def create_random_transform(
    rng: np.random.RandomState,
    max_rotation_deg: float = 45.0,
    max_translation: float = 0.0,
) -> np.ndarray:
    """One [1, 7] twist with uniform euler angles in +-max_rotation_deg
    (qdataset.py:122-130). Returns numpy for dataset pre-generation."""
    max_rot = deg_to_rad(max_rotation_deg)
    euler = rng.uniform(-max_rot, max_rot, (1, 3))
    quat = np.asarray(Q.euler_to_quaternion(jnp.asarray(euler), "xyz"))
    trans = rng.uniform(-max_translation, max_translation, (1, 3))
    return np.concatenate([quat, trans], axis=1).astype(np.float32)
