"""Fused approx-EMD kernel (interpret mode on CPU) vs the XLA scan path.

Ground truth is the double-precision numpy oracle of the reference CPU
spec (tests/oracles.py, tf_approxmatch.cpp:23-105). The kernel computes
distance tiles in broadcast-difference form, which at the steepest
auction level (|level| = 65536, where exp amplifies d2 error 65536-fold)
is ~200x CLOSER to the f64 oracle than the XLA path's matmul-identity
pairwise_sqdist (measured at [2, 128, 64]: kernel rel err 7e-6 vs XLA
1.6e-3) — so the kernel is held to the tight oracle tolerance and only
loosely to the XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samplenet_tpu.ops.matching import (
    approx_emd_cost,
    approx_match,
    match_cost,
)
from samplenet_tpu.ops.pallas.emd_kernel import emd_cost_pallas
from tests.oracles import approx_match_np, match_cost_np


def _xla_cost(x1, x2, fast_math=False):
    return match_cost(x1, x2, approx_match(x1, x2, fast_math=fast_math))


def _oracle_cost_and_match(x1, x2):
    x1d = np.asarray(x1, np.float64)
    x2d = np.asarray(x2, np.float64)
    match = approx_match_np(x1d, x2d)
    return match_cost_np(x1d, x2d, match), match


def _oracle_grads(x1, x2, match):
    """Analytic MatchCostGrad from the oracle match (f64):
    g1[i] = sum_j match[i,j] (x1[i]-x2[j]) / d[i,j], and symmetrically."""
    x1d = np.asarray(x1, np.float64)
    x2d = np.asarray(x2, np.float64)
    diff = x1d[:, :, None, :] - x2d[:, None, :, :]      # [B, n, m, 3]
    d = np.maximum(np.sqrt((diff ** 2).sum(-1)), 1e-20)
    u = match / d
    g1 = (u[..., None] * diff).sum(axis=2)
    g2 = -(u[..., None] * diff).sum(axis=1)
    return g1, g2


def _clouds(b, n, m, seed=0):
    rng = np.random.RandomState(seed)
    x1 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    x2 = jnp.asarray(rng.randn(b, m, 3).astype(np.float32))
    return x1, x2


class TestEmdCostKernel:
    @pytest.mark.parametrize("n,m", [(256, 256), (96, 160), (128, 64),
                                     (64, 128)])
    def test_cost_parity(self, n, m):
        x1, x2 = _clouds(2, n, m)
        oracle, _ = _oracle_cost_and_match(x1, x2)
        got = np.asarray(emd_cost_pallas(x1, x2, with_grads=False,
                                         interpret=True)[0])
        np.testing.assert_allclose(got, oracle, rtol=2e-4)
        # the XLA scan path agrees more loosely (its matmul-identity d2
        # loses precision exactly where the steep levels amplify it)
        np.testing.assert_allclose(got, np.asarray(_xla_cost(x1, x2)),
                                   rtol=5e-3)

    def test_cost_same_with_and_without_grads(self):
        x1, x2 = _clouds(2, 128, 128, seed=3)
        c0 = emd_cost_pallas(x1, x2, with_grads=False, interpret=True)[0]
        c1, g1, g2 = emd_cost_pallas(x1, x2, with_grads=True, interpret=True)
        np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), rtol=1e-6)
        assert g1.shape == x1.shape and g2.shape == x2.shape

    def test_nograds_variant_emits_zeros(self):
        x1, x2 = _clouds(1, 64, 64, seed=5)
        _, g1, g2 = emd_cost_pallas(x1, x2, with_grads=False, interpret=True)
        assert float(jnp.abs(g1).max()) == 0.0
        assert float(jnp.abs(g2).max()) == 0.0

    @pytest.mark.parametrize("n,m", [(128, 128), (96, 160)])
    def test_grad_parity_vs_oracle(self, n, m):
        """Both f32 paths drift from the f64-oracle match identically where
        the steep auction levels amplify roundoff (measured: kernel 1.8e-3
        vs XLA-autodiff 2.9e-3 at 128x128; 7.35e-2 vs 7.34e-2 on a seed
        where one near-tie flips) — so the kernel's gradients are held to
        "at least as faithful as the XLA autodiff", plus a floor for the
        cases where both are tight."""
        x1, x2 = _clouds(2, n, m, seed=7)
        _, match = _oracle_cost_and_match(x1, x2)
        ref_g1, ref_g2 = _oracle_grads(x1, x2, match)
        _, g1, g2 = emd_cost_pallas(x1, x2, with_grads=True, interpret=True)
        ad_g1, ad_g2 = jax.grad(
            lambda a, b: jnp.sum(_xla_cost(a, b)), argnums=(0, 1))(x1, x2)
        scale = float(np.abs(ref_g1).max())
        for got, ad, ref in ((g1, ad_g1, ref_g1), (g2, ad_g2, ref_g2)):
            kerr = float(np.abs(np.asarray(got) - ref).max())
            xerr = float(np.abs(np.asarray(ad) - ref).max())
            assert kerr <= max(1.5 * xerr, 5e-4 * scale), (kerr, xerr)

    def test_coincident_points_finite(self):
        # d2 == 0 pairs must produce zero (not NaN) gradient terms — the
        # reference clamps d at 1e-20 (tf_approxmatch_g.cu MatchCostGrad)
        rng = np.random.RandomState(11)
        pts = rng.randn(1, 64, 3).astype(np.float32)
        x1 = jnp.asarray(pts)
        x2 = jnp.asarray(pts.copy())
        cost, g1, g2 = emd_cost_pallas(x1, x2, with_grads=True,
                                       interpret=True)
        assert np.isfinite(np.asarray(cost)).all()
        assert np.isfinite(np.asarray(g1)).all()
        assert np.isfinite(np.asarray(g2)).all()
        # identical clouds transport at ~zero cost
        assert float(cost[0]) < 1e-3 * 64

    def test_custom_vjp_wrapper(self, monkeypatch):
        # route approx_emd_cost through the kernel on CPU via interpret
        import samplenet_tpu.ops.pallas.emd_kernel as ek

        orig = ek.emd_cost_pallas
        monkeypatch.setattr(
            ek, "emd_cost_pallas",
            lambda a, b, with_grads=True, interpret=False: orig(
                a, b, with_grads=with_grads, interpret=True))
        x1, x2 = _clouds(2, 96, 96, seed=13)
        got = approx_emd_cost(x1, x2, use_pallas=True)
        oracle, _ = _oracle_cost_and_match(x1, x2)
        np.testing.assert_allclose(np.asarray(got), oracle, rtol=2e-4)
        # the vjp must route the kernel's own analytic grads: exact match
        # against a direct kernel call scaled by d mean / d cost = 1/B
        g_got = jax.grad(lambda a: jnp.mean(
            approx_emd_cost(a, x2, use_pallas=True)))(x1)
        g_kernel = orig(x1, x2, with_grads=True, interpret=True)[1]
        np.testing.assert_allclose(np.asarray(g_got),
                                   np.asarray(g_kernel) / x1.shape[0],
                                   rtol=1e-6)

    def test_dispatch_default_cpu_is_xla(self):
        # on CPU pallas_backend_ok() is False -> approx_emd_cost must give
        # bitwise the XLA path
        x1, x2 = _clouds(1, 64, 64, seed=17)
        got = approx_emd_cost(x1, x2)
        ref = _xla_cost(x1, x2)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
