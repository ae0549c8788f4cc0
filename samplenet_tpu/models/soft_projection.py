"""Soft projection: the differentiable-sampling relaxation of SampleNet.

For every simplified (query) point, find its `group_size` nearest neighbours
in the original cloud, weight them by softmax(-d^2 / sigma^2), and emit the
convex combination. The temperature is a trainable scalar; sigma^2 drives the
projection loss toward hard (one-hot) selection.

Reference semantics (see SURVEY.md section 0.2):
  * torch (registration/src/soft_projection.py:92-99): sigma^2 = max(t^2, min_sigma)
  * TF classification (classification/soft_projection.py:41): sigma^2 = t^2, no clamp
  * TF reconstruction (reconstruction/src/soft_projection.py:51-54): sigma^2 = max(t, eps)^2
All three are selectable via `sigma_mode`; the torch variant is the default.

Hard mode (classification/soft_projection.py:73-76): one-hot of argmax weight —
i.e. snap each query point to its overall nearest input point.

The whole op is one fused region under jit: matmul-formulated kNN (MXU) ->
gather -> softmax -> weighted sum (VPU); no custom scatter kernels needed.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from samplenet_tpu.ops.knn import group_point, knn_point


def sigma_from_temperature(
    temperature: jax.Array, mode: str, min_sigma: float
) -> jax.Array:
    if mode == "torch":
        return jnp.maximum(temperature**2, min_sigma)
    if mode == "tf":
        return temperature**2
    if mode == "recon":
        return jnp.maximum(temperature, min_sigma) ** 2
    raise ValueError(f"unknown sigma_mode: {mode!r}")


class SoftProjection(nn.Module):
    """Projects query points onto soft nearest-neighbour mixtures.

    Attributes:
      group_size: neighbourhood size k.
      initial_temperature: init for the trainable scalar temperature.
      is_temperature_trainable: if False the temperature is a frozen constant.
      min_sigma: clamp floor for sigma^2 (mode-dependent, see module doc).
      sigma_mode: 'torch' | 'tf' | 'recon'.

    All point clouds are [B, N, 3] / [B, M, 3] ("bnc").
    """

    group_size: int
    initial_temperature: float = 1.0
    is_temperature_trainable: bool = True
    min_sigma: float = 1e-2
    sigma_mode: str = "torch"
    # fused Pallas kernel for project() (differentiable; ~1.8x the XLA path
    # in training at B=1024). None = auto: on for TPU backends, off for
    # CPU/GPU. Explicit True/False overrides.
    use_pallas: bool | None = None

    def setup(self):
        init = nn.initializers.constant(self.initial_temperature)
        if self.is_temperature_trainable:
            self._temperature = self.param("temperature", init, ())
        else:
            self._temperature = self.variable(
                "constants", "temperature", lambda: jnp.asarray(self.initial_temperature)
            ).value

    def sigma(self) -> jax.Array:
        return sigma_from_temperature(
            self._temperature, self.sigma_mode, self.min_sigma
        )

    def _group(self, point_cloud, query_cloud, point_features=None):
        _, idx = knn_point(self.group_size, point_cloud, query_cloud)
        grouped_points = group_point(point_cloud, idx)  # [B, M, k, 3]
        grouped_features = (
            None if point_features is None else group_point(point_features, idx)
        )
        return grouped_points, grouped_features

    def _weights(self, grouped_points, query_cloud):
        deltas = grouped_points - query_cloud[:, :, None, :]
        dist = jnp.sum(deltas**2, axis=-1) / self.sigma()   # [B, M, k]
        return jax.nn.softmax(-dist, axis=-1), dist

    def project(self, point_cloud, query_cloud, hard: bool = False):
        """Returns (projected [B, M, 3], weights [B, M, k], dist [B, M, k]).

        With use_pallas=True the soft path runs the fused Pallas kernel
        (ops/pallas/soft_projection_kernel.py) — one VMEM pass, custom VJP —
        and weights/dist come back as None (they only exist as kernel
        internals there). The hard path likewise dispatches to the Pallas
        1-NN snap kernel: argmax over the k-NN weights IS the global 1-NN
        (the nearest point is in every k-neighbourhood), so the XLA route's
        chunked k-NN — a scan of top_k sorts, ~18 ms of a 38 ms progressive
        infer step at [B=32, 1024->1024] — reduces to one 0.6 ms kernel
        that emits the snapped coordinates gather-free."""
        use_pallas = self.use_pallas
        if use_pallas is None:
            from samplenet_tpu.ops.dispatch import pallas_backend_ok

            use_pallas = pallas_backend_ok() and (hard or self.group_size <= 16)
        if use_pallas and hard:
            from samplenet_tpu.ops.pallas import nn_snap

            _, _, snapped = nn_snap(
                query_cloud, point_cloud,
                tile_x=min(512, query_cloud.shape[1]))
            return snapped, None, None
        if use_pallas and not hard:
            from samplenet_tpu.ops.pallas import soft_project

            projected = soft_project(
                point_cloud, query_cloud, self.sigma(), self.group_size)
            return projected, None, None
        grouped_points, _ = self._group(point_cloud, query_cloud)
        weights, dist = self._weights(grouped_points, query_cloud)
        if hard:
            one_hot = jax.nn.one_hot(
                jnp.argmax(weights, axis=-1), self.group_size, dtype=weights.dtype
            )
            weights = one_hot
        projected = jnp.sum(grouped_points * weights[..., None], axis=2)
        return projected, weights, dist

    def propagate(self, point_cloud, point_features, query_cloud):
        """Soft-kNN feature propagation: [B, N, F] features -> [B, M, F]."""
        grouped_points, grouped_features = self._group(
            point_cloud, query_cloud, point_features
        )
        weights, _ = self._weights(grouped_points, query_cloud)
        return jnp.sum(grouped_features * weights[..., None], axis=2)

    def project_and_propagate(self, point_cloud, point_features, query_cloud):
        grouped_points, grouped_features = self._group(
            point_cloud, query_cloud, point_features
        )
        weights, _ = self._weights(grouped_points, query_cloud)
        projected = jnp.sum(grouped_points * weights[..., None], axis=2)
        propagated = jnp.sum(grouped_features * weights[..., None], axis=2)
        return projected, propagated

    def __call__(self, point_cloud, query_cloud, point_features=None,
                 action: str = "project", hard: bool = False):
        if action == "project":
            return self.project(point_cloud, query_cloud, hard=hard)[0]
        if action == "propagate":
            return self.propagate(point_cloud, point_features, query_cloud)
        if action == "project_and_propagate":
            return self.project_and_propagate(
                point_cloud, point_features, query_cloud
            )
        raise ValueError(f"unknown action: {action!r}")
