"""Pallas kernel tests (interpret mode on CPU) vs the pure-XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samplenet_tpu.ops.knn import group_point, knn_point
from samplenet_tpu.ops.pallas import fused_soft_projection


def xla_soft_projection(pc, qc, sigma, k):
    dist, idx = knn_point(k, pc, qc)
    grouped = group_point(pc, idx)
    w = jax.nn.softmax(-dist / sigma, axis=-1)
    return jnp.sum(grouped * w[..., None], axis=2)


class TestFusedSoftProjection:
    @pytest.mark.parametrize("k", [1, 3, 7])
    def test_matches_xla_path(self, k):
        rng = np.random.RandomState(0)
        pc = jnp.asarray(rng.randn(2, 256, 3), jnp.float32)
        qc = jnp.asarray(rng.randn(2, 128, 3), jnp.float32)
        sigma = jnp.asarray(0.5)
        exp = xla_soft_projection(pc, qc, sigma, k)
        got = fused_soft_projection(pc, qc, sigma, group_size=k,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=1e-4, atol=1e-5)

    def test_query_padding(self):
        """M not divisible by the tile size."""
        rng = np.random.RandomState(1)
        pc = jnp.asarray(rng.randn(1, 64, 3), jnp.float32)
        qc = jnp.asarray(rng.randn(1, 50, 3), jnp.float32)
        exp = xla_soft_projection(pc, qc, jnp.asarray(1.0), 4)
        got = fused_soft_projection(pc, qc, jnp.asarray(1.0), group_size=4,
                                    tile_m=16, interpret=True)
        assert got.shape == (1, 50, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=1e-4, atol=1e-5)

    def test_low_sigma_approaches_nn(self):
        """sigma -> 0 must converge to hard 1-NN selection."""
        rng = np.random.RandomState(2)
        pc = jnp.asarray(rng.randn(1, 32, 3), jnp.float32)
        qc = jnp.asarray(rng.randn(1, 16, 3), jnp.float32)
        got = fused_soft_projection(pc, qc, jnp.asarray(1e-4), group_size=4,
                                    interpret=True)
        _, idx = knn_point(1, pc, qc)
        nn = jnp.take_along_axis(pc, idx[..., 0][..., None], axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(nn), atol=1e-3)
