"""Serving utilities: AOT compilation and StableHLO export.

The reference has no deployment story (checkpoint + python graph rebuild);
here a trained sampler can be (a) AOT-compiled to a fixed-shape executable
with host-side padding for ragged batches, or (b) serialized to portable
StableHLO bytes (jax.export) that any XLA runtime can reload without the
model code.
"""

from __future__ import annotations

import numpy as np


class BatchedSampler:
    """AOT-compiled fixed-shape sampler for serving.

    Pads incoming batches up to `max_batch` (replicating the last cloud so
    matching stays well-defined) and slices results back. One compile at
    construction; every call afterwards is dispatch-only.
    """

    def __init__(self, net, variables, *, max_batch: int, num_points: int):
        import jax
        import jax.numpy as jnp

        self.max_batch = max_batch
        self.num_points = num_points

        def fwd(v, x):
            simp, out = net.apply(v, x, training=False)
            return out

        dummy = jnp.zeros((max_batch, num_points, 3), jnp.float32)
        self._compiled = (
            jax.jit(fwd).lower(variables, dummy).compile()
        )
        self._variables = variables

    def __call__(self, clouds: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        b = len(clouds)
        if b > self.max_batch:
            parts = [self(clouds[s : s + self.max_batch])
                     for s in range(0, b, self.max_batch)]
            return np.concatenate(parts)
        if clouds.shape[1] != self.num_points:
            raise ValueError(
                f"expected {self.num_points} points, got {clouds.shape[1]}")
        if b < self.max_batch:
            pad = np.repeat(clouds[-1:], self.max_batch - b, axis=0)
            clouds = np.concatenate([clouds, pad])
        out = self._compiled(self._variables, jnp.asarray(clouds))
        return np.asarray(out)[:b]


def export_stablehlo(net, variables, *, batch: int, num_points: int) -> bytes:
    """Serialize the eval forward to portable StableHLO bytes."""
    import jax
    import jax.numpy as jnp

    def fwd(v, x):
        return net.apply(v, x, training=False)[1]

    dummy = jax.ShapeDtypeStruct((batch, num_points, 3), jnp.float32)
    exported = jax.export.export(jax.jit(fwd))(variables, dummy)
    return exported.serialize()


def load_stablehlo(blob: bytes):
    """Reload an exported sampler; returns fn(variables, clouds) -> sampled."""
    import jax

    exported = jax.export.deserialize(blob)
    return exported.call


def save_exported(path: str, net, variables, *, batch: int,
                  num_points: int) -> None:
    with open(path, "wb") as f:
        f.write(export_stablehlo(net, variables, batch=batch,
                                 num_points=num_points))


def load_exported(path: str):
    with open(path, "rb") as f:
        return load_stablehlo(f.read())
