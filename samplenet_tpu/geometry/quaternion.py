"""Quaternion algebra in JAX, (w, x, y, z) convention.

Functional parity with registration/src/quaternion.py (Hamilton product,
vector rotation, euler conversions, antipodal fixing, exponential map) —
implemented from the standard formulas, batched over arbitrary leading
dimensions, and jit/vmap/grad-compatible throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def qmul(q: jax.Array, r: jax.Array) -> jax.Array:
    """Hamilton product q*r; both [..., 4] wxyz."""
    w1, x1, y1, z1 = jnp.moveaxis(q, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(r, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def qrot(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v [..., 3] by quaternions q [..., 4] (wxyz).

    Uses the Rodrigues form v + 2*(w*(u x v) + u x (u x v)).
    """
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def qinv(q: jax.Array) -> jax.Array:
    """Conjugate (inverse for unit quaternions)."""
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def qeuler(q: jax.Array, order: str = "xyz", epsilon: float = 0.0) -> jax.Array:
    """Quaternion -> intrinsic Euler angles for the six axis orders."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)

    def asin(v):
        return jnp.arcsin(jnp.clip(v, -1 + epsilon, 1 - epsilon))

    if order == "xyz":
        ex = jnp.arctan2(2 * (w * x - y * z), 1 - 2 * (x * x + y * y))
        ey = asin(2 * (x * z + w * y))
        ez = jnp.arctan2(2 * (w * z - x * y), 1 - 2 * (y * y + z * z))
    elif order == "yzx":
        ex = jnp.arctan2(2 * (w * x - y * z), 1 - 2 * (x * x + z * z))
        ey = jnp.arctan2(2 * (w * y - x * z), 1 - 2 * (y * y + z * z))
        ez = asin(2 * (x * y + w * z))
    elif order == "zxy":
        ex = asin(2 * (w * x + y * z))
        ey = jnp.arctan2(2 * (w * y - x * z), 1 - 2 * (x * x + y * y))
        ez = jnp.arctan2(2 * (w * z - x * y), 1 - 2 * (x * x + z * z))
    elif order == "xzy":
        ex = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + z * z))
        ey = jnp.arctan2(2 * (w * y + x * z), 1 - 2 * (y * y + z * z))
        ez = asin(2 * (w * z - x * y))
    elif order == "yxz":
        ex = asin(2 * (w * x - y * z))
        ey = jnp.arctan2(2 * (x * z + w * y), 1 - 2 * (x * x + y * y))
        ez = jnp.arctan2(2 * (x * y + w * z), 1 - 2 * (x * x + z * z))
    elif order == "zyx":
        ex = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
        ey = asin(2 * (w * y - x * z))
        ez = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    else:
        raise ValueError(f"unknown euler order {order!r}")
    return jnp.stack([ex, ey, ez], axis=-1)


def qfix(q: np.ndarray) -> np.ndarray:
    """Enforce sign continuity along the leading (time) axis of [L, J, 4]."""
    out = q.copy()
    dots = np.sum(q[1:] * q[:-1], axis=-1)
    flip = (np.cumsum(dots < 0, axis=0) % 2).astype(bool)
    out[1:][flip] *= -1
    return out


def expmap_to_quaternion(e: jax.Array) -> jax.Array:
    """Axis-angle [..., 3] -> quaternion, sinc-stable near zero."""
    theta = jnp.linalg.norm(e, axis=-1, keepdims=True)
    w = jnp.cos(0.5 * theta)
    xyz = 0.5 * jnp.sinc(0.5 * theta / jnp.pi) * e
    return jnp.concatenate([w, xyz], axis=-1)


def euler_to_quaternion(e: jax.Array, order: str = "xyz") -> jax.Array:
    """Euler angles [..., 3] -> quaternion, composing per-axis rotations.

    Matches the reference's convention including the antipodal flip for
    right-handed orders (quaternion.py:166-210)."""
    x, y, z = jnp.moveaxis(e, -1, 0)
    zeros = jnp.zeros_like(x)
    axis_q = {
        "x": jnp.stack([jnp.cos(x / 2), jnp.sin(x / 2), zeros, zeros], -1),
        "y": jnp.stack([jnp.cos(y / 2), zeros, jnp.sin(y / 2), zeros], -1),
        "z": jnp.stack([jnp.cos(z / 2), zeros, zeros, jnp.sin(z / 2)], -1),
    }
    result = None
    for ax in order:
        result = axis_q[ax] if result is None else qmul(result, axis_q[ax])
    if order in ("xyz", "yzx", "zxy"):
        result = -result
    return result


def quaternion_to_rotation_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion [..., 4] (wxyz) -> rotation matrix [..., 3, 3]."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    return r
