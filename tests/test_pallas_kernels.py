"""Pallas kernel tests (interpret mode on CPU) vs the pure-XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samplenet_tpu.ops.chamfer import nn_distance
from samplenet_tpu.ops.knn import group_point, knn_point
from samplenet_tpu.ops.pallas import (
    fused_soft_projection,
    nn_direction,
    nn_distance_pallas,
    soft_project,
)


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
        got, idx = fused_soft_projection(pc, qc, sigma, group_size=k,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=1e-4, atol=1e-5)
        # emitted indices must be the true kNN set (order-insensitive)
        _, exp_idx = knn_point(k, pc, qc)
        np.testing.assert_array_equal(np.sort(np.asarray(idx), -1),
                                      np.sort(np.asarray(exp_idx), -1))

    def test_query_padding(self):
        """M not divisible by the tile size."""
        rng = np.random.RandomState(1)
        pc = jnp.asarray(rng.randn(1, 64, 3), jnp.float32)
        qc = jnp.asarray(rng.randn(1, 50, 3), jnp.float32)
        exp = xla_soft_projection(pc, qc, jnp.asarray(1.0), 4)
        got, _ = fused_soft_projection(pc, qc, jnp.asarray(1.0), group_size=4,
                                       tile_m=16, interpret=True)
        assert got.shape == (1, 50, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=1e-4, atol=1e-5)

    def test_low_sigma_approaches_nn(self):
        """sigma -> 0 must converge to hard 1-NN selection."""
        rng = np.random.RandomState(2)
        pc = jnp.asarray(rng.randn(1, 32, 3), jnp.float32)
        qc = jnp.asarray(rng.randn(1, 16, 3), jnp.float32)
        got, _ = fused_soft_projection(pc, qc, jnp.asarray(1e-4), group_size=4,
                                       interpret=True)
        _, idx = knn_point(1, pc, qc)
        nn = jnp.take_along_axis(pc, idx[..., 0][..., None], axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(nn), atol=1e-3)


class TestDifferentiableSoftProject:
    def test_gradients_match_xla_path(self):
        rng = np.random.RandomState(3)
        pc = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        qc = jnp.asarray(rng.randn(2, 32, 3), jnp.float32)
        sigma = jnp.asarray(0.7)

        def loss_pallas(p, q, s):
            return jnp.sum(soft_project(p, q, s, 5, 128, True) ** 2)

        def loss_xla(p, q, s):
            return jnp.sum(xla_soft_projection(p, q, s, 5) ** 2)

        gp1, gq1, gs1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(pc, qc, sigma)
        gp2, gq2, gs2 = jax.grad(loss_xla, argnums=(0, 1, 2))(pc, qc, sigma)
        np.testing.assert_allclose(np.asarray(gq1), np.asarray(gq2),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gp1), np.asarray(gp2),
                                   rtol=1e-3, atol=1e-4)
        assert float(gs1) == pytest.approx(float(gs2), rel=1e-3)

    def test_forward_matches(self):
        rng = np.random.RandomState(4)
        pc = jnp.asarray(rng.randn(1, 48, 3), jnp.float32)
        qc = jnp.asarray(rng.randn(1, 16, 3), jnp.float32)
        out = soft_project(pc, qc, jnp.asarray(0.5), 3, 128, True)
        exp = xla_soft_projection(pc, qc, jnp.asarray(0.5), 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                                   rtol=1e-4, atol=1e-5)


class TestChamferKernel:
    def test_matches_xla_nn_distance(self):
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(2, 300, 3), jnp.float32)  # non-divisible N
        y = jnp.asarray(rng.randn(2, 200, 3), jnp.float32)
        d1, i1, d2, i2 = nn_distance_pallas(x, y, interpret=True)
        ed1, ei1, ed2, ei2 = nn_distance(x, y)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(ed1),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(ed2),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(ei1))
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(ei2))

    def test_self_distance_zero(self):
        rng = np.random.RandomState(6)
        x = jnp.asarray(rng.randn(1, 128, 3), jnp.float32)
        d1, i1, _, _ = nn_distance_pallas(x, x, interpret=True)
        np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1)[0], np.arange(128))

    def test_snap_emits_exact_nn_coordinates(self):
        # nn_snap = nn_direction + the NN's coordinates, emitted in-kernel;
        # snapped points must be database rows BITWISE (hard-projection
        # invariant: outputs are input points, never recomputed values).
        from samplenet_tpu.ops.pallas import nn_snap
        rng = np.random.RandomState(12)
        x = jnp.asarray(rng.randn(3, 300, 3), jnp.float32)  # pad path: 300
        y = jnp.asarray(rng.randn(3, 200, 3), jnp.float32)
        d, i, snapped = nn_snap(x, y, interpret=True)
        ed, ei = nn_direction(x, y, interpret=True)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))
        np.testing.assert_allclose(np.asarray(d), np.asarray(ed),
                                   rtol=1e-5, atol=1e-6)
        exp = np.take_along_axis(
            np.asarray(y), np.asarray(i)[..., None], axis=1)
        np.testing.assert_array_equal(np.asarray(snapped), exp)

    def test_block_b_is_pure_tiling(self):
        """block_b only tiles the batch-vectorized kernel body: every valid
        block size must give BITWISE the same dist/idx/snapped outputs (the
        r5 vectorized body carries [BB, ...] through the vector ops rather
        than Python-unrolling per-cloud, so this is the invariant that lets
        the default block change without touching semantics)."""
        from samplenet_tpu.ops.pallas import nn_snap
        rng = np.random.RandomState(14)
        x = jnp.asarray(rng.randn(8, 96, 3), jnp.float32)
        y = jnp.asarray(rng.randn(8, 160, 3), jnp.float32)
        base = nn_snap(x, y, block_b=1, interpret=True)
        for bb in (2, 4, 8):
            got = nn_snap(x, y, block_b=bb, interpret=True)
            for g, b in zip(got, base):
                np.testing.assert_array_equal(np.asarray(g), np.asarray(b))
        d1, i1 = nn_direction(x, y, block_b=1, interpret=True)
        for bb in (4, 8):
            d, i = nn_direction(x, y, block_b=bb, interpret=True)
            np.testing.assert_array_equal(np.asarray(d), np.asarray(d1))
            np.testing.assert_array_equal(np.asarray(i), np.asarray(i1))

    def test_snap_matches_hard_projection(self):
        # argmax over k-NN softmax weights IS the global 1-NN: the Pallas
        # hard-projection dispatch must reproduce the XLA knn+argmax path.
        from samplenet_tpu.models.soft_projection import SoftProjection
        from samplenet_tpu.ops.pallas import nn_snap
        rng = np.random.RandomState(13)
        pc = jnp.asarray(rng.randn(2, 256, 3), jnp.float32)
        q = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        proj = SoftProjection(group_size=7, use_pallas=False)
        vars_ = proj.init(jax.random.PRNGKey(0), pc, q)
        hard_xla = proj.apply(
            vars_, pc, q, method=lambda m, a, b: m.project(a, b, hard=True)[0]
        )
        _, _, hard_kernel = nn_snap(q, pc, tile_x=64, interpret=True)
        np.testing.assert_array_equal(np.asarray(hard_kernel),
                                      np.asarray(hard_xla))


class TestFPSKernel:
    def test_plain_matches_xla(self):
        from samplenet_tpu.ops.fps import farthest_point_sample
        from samplenet_tpu.ops.pallas import farthest_point_sample_pallas
        rng = np.random.RandomState(7)
        pts = jnp.asarray(rng.randn(4, 200, 3), jnp.float32)
        got = farthest_point_sample_pallas(16, pts, interpret=True)
        exp = farthest_point_sample(16, pts)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))

    def test_random_start(self):
        from samplenet_tpu.ops.fps import farthest_point_sample
        from samplenet_tpu.ops.pallas import farthest_point_sample_pallas
        rng = np.random.RandomState(8)
        pts = jnp.asarray(rng.randn(3, 100, 3), jnp.float32)
        start = jnp.asarray([5, 17, 99], jnp.int32)
        got = farthest_point_sample_pallas(8, pts, start_idx=start,
                                           interpret=True)
        exp = farthest_point_sample(8, pts, start_idx=start)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))

    def test_seeded_matches_xla(self):
        from samplenet_tpu.ops.fps import fps_from_given
        from samplenet_tpu.ops.pallas import fps_from_given_pallas
        rng = np.random.RandomState(9)
        pts = jnp.asarray(rng.randn(5, 150, 3), jnp.float32)
        given = jnp.asarray(rng.randint(0, 150, (5, 12)), jnp.int32)
        count = jnp.asarray([1, 4, 12, 2, 7], jnp.int32)
        got = fps_from_given_pallas(12, pts, given, count, interpret=True)
        exp = fps_from_given(12, pts, given, count)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))

    def test_batch_padding(self):
        from samplenet_tpu.ops.fps import farthest_point_sample
        from samplenet_tpu.ops.pallas import farthest_point_sample_pallas
        rng = np.random.RandomState(10)
        pts = jnp.asarray(rng.randn(5, 64, 3), jnp.float32)  # 5 % block != 0
        got = farthest_point_sample_pallas(8, pts, block_b=4, interpret=True)
        exp = farthest_point_sample(8, pts)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))

    def test_with_points_output_bitexact(self):
        # The emit_xyz variant must return exactly points[b, idx[b, t]] —
        # it replaces gather_point on the matching completion path, and
        # matched outputs are input points by contract
        # (sputils.nn_matching; hard-projection invariant).
        from samplenet_tpu.ops.fps import fps_from_given, gather_point
        from samplenet_tpu.ops.pallas.fps_kernel import (
            fps_from_given_pallas_with_points,
        )
        rng = np.random.RandomState(11)
        pts = jnp.asarray(rng.randn(5, 150, 3), jnp.float32)
        given = jnp.asarray(rng.randint(0, 150, (5, 12)), jnp.int32)
        count = jnp.asarray([1, 4, 12, 2, 7], jnp.int32)
        idx, xyz = fps_from_given_pallas_with_points(
            12, pts, given, count, block_b=4, interpret=True)
        exp_idx = fps_from_given(12, pts, given, count, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(exp_idx))
        np.testing.assert_array_equal(
            np.asarray(xyz), np.asarray(gather_point(pts, idx)))


class TestPointMLPKernel:
    """Fused per-point-MLP + max kernel vs the flax eval path."""

    def _setup(self, feats=(64, 64, 64, 128, 128), b=8, n=160):
        from samplenet_tpu.nn.layers import PointMLP

        m = PointMLP(features=feats)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, n, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x[:2], training=False)
        # non-trivial BN statistics so the affine fold is actually exercised
        bs = jax.tree.map(
            lambda a: a + 0.1 * np.random.RandomState(1)
            .randn(*a.shape).astype(np.float32), v["batch_stats"])
        return m, {"params": v["params"], "batch_stats": bs}, x

    def test_kernel_matches_folded_eval(self):
        from samplenet_tpu.ops.pallas.point_mlp_kernel import (
            fold_bn_affine, point_mlp_max)

        m, v, x = self._setup()
        ref = jnp.max(m.apply(v, x, training=False), axis=1)
        wbs = []
        for i in range(5):
            d = v["params"][f"dense_{i}"]
            bn = v["params"][f"bn_{i}"]
            st = v["batch_stats"][f"bn_{i}"]
            w, bias = fold_bn_affine(d["kernel"], d["bias"], bn["scale"],
                                     bn["bias"], st["mean"], st["var"])
            wbs += [w, bias]
        out = point_mlp_max(x, tuple(wbs), interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_pool_max_dispatch_parity_and_param_tree(self):
        """PointMLP(use_pallas=True) pool_max path: same param tree, same
        numerics as the XLA path (the dummy-materialisation trick must
        produce an identical checkpoint structure)."""
        from samplenet_tpu.nn.layers import PointMLP

        m, v, x = self._setup()
        fused = PointMLP(features=(64, 64, 64, 128, 128), use_pallas=True)
        v2 = fused.init(jax.random.PRNGKey(0), x[:2], training=False,
                        pool_max=True)
        ref_tree = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v)
        got_tree = jax.tree.map(lambda a: (a.shape, str(a.dtype)),
                                {"params": v2["params"],
                                 "batch_stats": v2["batch_stats"]})
        assert ref_tree == got_tree
        ref = jnp.max(m.apply(v, x, training=False), axis=1)
        out = fused.apply(v, x, training=False, pool_max=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        # training path ignores the kernel (batch-stat BN not foldable)
        tr, _ = fused.apply(v, x, training=True, pool_max=True,
                            mutable=["batch_stats"])
        tr_ref, _ = m.apply(v, x, training=True, pool_max=True,
                            mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(tr), np.asarray(tr_ref),
                                   atol=1e-5)

    def test_samplenet_eval_forward_with_fused_mlp(self):
        """Full SampleNet eval forward with the fused simplification MLP
        matches the plain path bit-for-bit in indices."""
        from samplenet_tpu.models import SampleNet

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(4, 256, 3), jnp.float32)
        plain = SampleNet(num_out_points=16, bottleneck_size=64, group_size=4)
        v = plain.init(jax.random.PRNGKey(0), x[:2], training=False)
        simp_ref, match_ref = plain.apply(v, x, training=False)
        # monkeypatch dispatch so the fused path runs (interpret) on CPU
        import samplenet_tpu.nn.layers as layers_mod

        orig = layers_mod.PointMLP._fused_ok
        layers_mod.PointMLP._fused_ok = (
            lambda self, x, training, pool_max:
            pool_max and not training and x.ndim == 3)
        try:
            simp, match = plain.apply(v, x, training=False)
        finally:
            layers_mod.PointMLP._fused_ok = orig
        np.testing.assert_allclose(np.asarray(simp), np.asarray(simp_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(match), np.asarray(match_ref),
                                   atol=1e-3)


def _ghost_oracle(x, params, feats, block_b, eps=1e-5, momentum=0.9, bs=None):
    """Pure-JAX ghost-BN chain + max pool with flax param naming. Returns
    (pooled, updated batch_stats or None)."""
    b, n, _ = x.shape
    h = x.reshape(b // block_b, block_b * n, -1)
    new_bs = {}
    for i in range(len(feats)):
        w = params[f"dense_{i}"]["kernel"]
        bi = params[f"dense_{i}"]["bias"]
        gm = params[f"bn_{i}"]["scale"]
        bt = params[f"bn_{i}"]["bias"]
        z = h @ w
        mu = jnp.mean(z, axis=1, keepdims=True)
        var = jnp.mean(z * z, axis=1, keepdims=True) - mu * mu
        xhat = (z - mu) * jax.lax.rsqrt(var + eps)
        h = jnp.maximum(gm * xhat + bt, 0.0)
        if bs is not None:
            zg = (z + bi).reshape(-1, z.shape[-1])
            gmu = jnp.mean(zg, axis=0)
            gvar = jnp.mean(zg * zg, axis=0) - gmu ** 2
            new_bs[f"bn_{i}"] = {
                "mean": momentum * bs[f"bn_{i}"]["mean"] + (1 - momentum) * gmu,
                "var": momentum * bs[f"bn_{i}"]["var"] + (1 - momentum) * gvar,
            }
    return jnp.max(h.reshape(b, n, -1), axis=1), (new_bs or None)


class TestPointMLPTrainKernel:
    """Fused ghost-BN TRAIN kernel (point_mlp_train_kernel.py) vs a pure-JAX
    ghost-BN oracle, plus the flax integration contract."""

    FEATS = (8, 16, 8)
    B, N = 4, 128

    def _fused_pair(self):
        from samplenet_tpu.nn.layers import PointMLP

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(self.B, self.N, 3), jnp.float32)
        plain = PointMLP(features=self.FEATS)
        fused = PointMLP(features=self.FEATS, fused_train=True)
        v = plain.init(jax.random.PRNGKey(0), x[:2], training=False)
        # perturb params/stats so the oracle comparison is non-trivial
        r = np.random.RandomState(1)
        v = jax.tree.map(
            lambda a: a + 0.1 * r.randn(*a.shape).astype(np.float32), v)
        return plain, fused, v, x

    def test_param_tree_identical_to_xla_path(self):
        plain, fused, v, x = self._fused_pair()
        v2 = fused.init(jax.random.PRNGKey(0), x[:2], training=False)
        t1 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v)
        t2 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v2)
        assert t1 == t2

    def test_forward_and_ema_match_ghost_oracle(self):
        from samplenet_tpu.ops.pallas.point_mlp_train_kernel import (
            auto_block_b,
        )

        _, fused, v, x = self._fused_pair()
        bb = auto_block_b(self.B, self.N, self.FEATS, bf16=False)
        out, upd = fused.apply(v, x, training=True, pool_max=True,
                               mutable=["batch_stats"])
        ref, ref_bs = _ghost_oracle(x, v["params"], self.FEATS, bb,
                                    bs=v["batch_stats"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
        for k, stats in ref_bs.items():
            got = upd["batch_stats"][k]
            np.testing.assert_allclose(np.asarray(got["mean"]),
                                       np.asarray(stats["mean"]),
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(got["var"]),
                                       np.asarray(stats["var"]),
                                       rtol=1e-3, atol=1e-5)

    def test_gradients_match_ghost_oracle(self):
        from samplenet_tpu.ops.pallas.point_mlp_train_kernel import (
            auto_block_b,
        )

        _, fused, v, x = self._fused_pair()
        bb = auto_block_b(self.B, self.N, self.FEATS, bf16=False)

        def loss(params):
            out, _ = fused.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, training=True, pool_max=True, mutable=["batch_stats"])
            return jnp.sum(jnp.sin(out))

        def loss_o(params):
            out, _ = _ghost_oracle(x, params, self.FEATS, bb)
            return jnp.sum(jnp.sin(out))

        g = jax.grad(loss)(v["params"])
        go = jax.grad(loss_o)(v["params"])
        for i in range(len(self.FEATS)):
            for mod, key in [(f"dense_{i}", "kernel"), (f"bn_{i}", "scale"),
                             (f"bn_{i}", "bias")]:
                np.testing.assert_allclose(
                    np.asarray(g[mod][key]), np.asarray(go[mod][key]),
                    rtol=1e-3, atol=1e-4, err_msg=f"{mod}/{key}")
            # BN's mean subtraction cancels the dense bias exactly
            assert float(jnp.max(jnp.abs(g[f"dense_{i}"]["bias"]))) == 0.0

    def test_fallback_when_no_block_fits(self):
        """Shapes with no valid batch block (or N % 128 != 0) silently use
        the XLA global-BN chain — numerics identical to fused_train=False."""
        from samplenet_tpu.nn.layers import PointMLP

        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(3, 96, 3), jnp.float32)  # N % 128 != 0
        plain = PointMLP(features=self.FEATS)
        fused = PointMLP(features=self.FEATS, fused_train=True)
        v = plain.init(jax.random.PRNGKey(0), x[:2], training=False)
        ref, upd_ref = plain.apply(v, x, training=True, pool_max=True,
                                   mutable=["batch_stats"])
        out, upd = fused.apply(v, x, training=True, pool_max=True,
                               mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                    np.asarray(b), atol=1e-6),
            upd, upd_ref)

    def test_fused_train_plumbed_through_all_track_configs(self):
        """Every sampler-training track exposes the ghost-BN kernel via its
        config (`--fused-train` in the four CLIs)."""
        from samplenet_tpu.train.classification import SampleNetConfig
        from samplenet_tpu.train.classification import (
            create_samplenet_state as cls_create,
        )
        from samplenet_tpu.train.progressive import (
            ProgressiveConfig,
            create_progressive_state,
        )
        from samplenet_tpu.train.reconstruction import (
            SampleNetAEConfig,
            make_recon_sampler,
        )
        from samplenet_tpu.train.registration import (
            RegistrationConfig,
            create_sampler_state,
        )

        rng = jax.random.PRNGKey(0)
        cls_sampler, _ = cls_create(
            SampleNetConfig(num_out_points=8, fused_train=True), 128, rng)
        reg_sampler, _ = create_sampler_state(
            RegistrationConfig(num_points=128, num_out_points=8,
                               fused_train=True), rng)
        prog_sampler, _ = create_progressive_state(
            ProgressiveConfig(max_num_out_points=16, fused_train=True),
            128, rng)
        ae_sampler = make_recon_sampler(
            SampleNetAEConfig(num_out_points=8, fused_train=True))
        for sampler in (cls_sampler, reg_sampler, prog_sampler, ae_sampler):
            assert sampler.fused_train

    def test_tri_state_fused_resolution(self):
        """fused_train tri-state (r4 default flip): None = auto exact-BN
        fused on TPU only (off-TPU -> XLA chain, so CPU CI never pays
        interpret-mode kernels); True = the configured fused_mode;
        False = forced XLA chain."""
        import jax.numpy as jnp

        from samplenet_tpu.nn.layers import PointMLP

        x = jnp.zeros((4, 256, 3), jnp.float32)
        auto = PointMLP(features=(64, 128))
        forced_off = PointMLP(features=(64, 128), fused_train=False)
        forced_ghost = PointMLP(features=(64, 128), fused_train=True)
        forced_exact = PointMLP(features=(64, 128), fused_train=True,
                                fused_mode="exact")
        # this suite runs on the CPU backend: auto must resolve to the
        # XLA chain, explicit True must keep the requested variant
        assert auto._resolve_fused_mode(x, True, True) is None
        assert forced_off._resolve_fused_mode(x, True, True) is None
        assert forced_ghost._resolve_fused_mode(x, True, True) == "ghost"
        assert forced_exact._resolve_fused_mode(x, True, True) == "exact"
        # eval / non-pooled / indivisible-N calls never fuse
        assert forced_ghost._resolve_fused_mode(x, False, True) is None
        assert forced_ghost._resolve_fused_mode(x, True, False) is None
        assert forced_ghost._resolve_fused_mode(
            jnp.zeros((4, 200, 3), jnp.float32), True, True) is None


class TestPointMLPExactKernel:
    """Fused EXACT-BN train kernel (point_mlp_exact_kernel.py): the oracle
    is the plain XLA chain itself — forward, EMA statistics, and every
    gradient must match to f32 precision (zero semantic change)."""

    FEATS = (8, 16, 8)
    B, N = 4, 128

    def _pair(self):
        from samplenet_tpu.nn.layers import PointMLP

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(self.B, self.N, 3), jnp.float32)
        plain = PointMLP(features=self.FEATS)
        fused = PointMLP(features=self.FEATS, fused_train=True,
                         fused_mode="exact")
        v = plain.init(jax.random.PRNGKey(0), x[:2], training=False)
        r = np.random.RandomState(1)
        v = jax.tree.map(
            lambda a: a + 0.1 * r.randn(*a.shape).astype(np.float32), v)
        return plain, fused, v, x

    def test_forward_and_ema_match_xla_chain(self):
        plain, fused, v, x = self._pair()
        ref, upd_ref = plain.apply(v, x, training=True, pool_max=True,
                                   mutable=["batch_stats"])
        out, upd = fused.apply(v, x, training=True, pool_max=True,
                               mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            upd, upd_ref)

    def test_gradients_match_xla_chain(self):
        plain, fused, v, x = self._pair()

        def loss(mod):
            def f(params, xx):
                out, _ = mod.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    xx, training=True, pool_max=True,
                    mutable=["batch_stats"])
                return jnp.sum(jnp.sin(out))
            return f

        g, gx = jax.grad(loss(fused), argnums=(0, 1))(v["params"], x)
        go, gxo = jax.grad(loss(plain), argnums=(0, 1))(v["params"], x)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gxo),
                                   rtol=1e-4, atol=1e-5)
        for i in range(len(self.FEATS)):
            for mod, key in [(f"dense_{i}", "kernel"), (f"bn_{i}", "scale"),
                             (f"bn_{i}", "bias")]:
                np.testing.assert_allclose(
                    np.asarray(g[mod][key]), np.asarray(go[mod][key]),
                    rtol=1e-3, atol=1e-5, err_msg=f"{mod}/{key}")
            # BN's mean subtraction cancels the dense bias exactly
            assert float(jnp.max(jnp.abs(g[f"dense_{i}"]["bias"]))) == 0.0

    def test_explicit_block_b_is_pure_tiling(self):
        """Unlike ghost BN, block_b has no semantic meaning: every valid
        tiling gives the same (exact) result."""
        from samplenet_tpu.ops.pallas.point_mlp_exact_kernel import (
            point_mlp_exact_train_max,
        )

        _, _, v, x = self._pair()
        ws = tuple(v["params"][f"dense_{i}"]["kernel"] for i in range(3))
        bs = tuple(v["params"][f"dense_{i}"]["bias"] for i in range(3))
        gs = tuple(v["params"][f"bn_{i}"]["scale"] for i in range(3))
        be = tuple(v["params"][f"bn_{i}"]["bias"] for i in range(3))
        outs = [point_mlp_exact_train_max(x, ws, bs, gs, be, block_b=bb,
                                          interpret=True)[0]
                for bb in (1, 2, 4)]
        np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[2]),
                                   rtol=1e-6, atol=1e-6)

    def test_fused_mode_plumbed_through_all_track_configs(self):
        from samplenet_tpu.train.classification import SampleNetConfig
        from samplenet_tpu.train.classification import (
            create_samplenet_state as cls_create,
        )
        from samplenet_tpu.train.progressive import (
            ProgressiveConfig,
            create_progressive_state,
        )
        from samplenet_tpu.train.reconstruction import (
            AEConfig,
            SampleNetAEConfig,
            create_ae_state,
            make_recon_sampler,
        )
        from samplenet_tpu.train.registration import (
            RegistrationConfig,
            create_sampler_state,
        )

        rng = jax.random.PRNGKey(0)
        cls_sampler, _ = cls_create(
            SampleNetConfig(num_out_points=8, fused_train=True,
                            fused_mode="exact", fused_bf16=False), 128, rng)
        reg_sampler, _ = create_sampler_state(
            RegistrationConfig(num_points=128, num_out_points=8,
                               fused_train=True, fused_mode="exact"), rng)
        prog_sampler, _ = create_progressive_state(
            ProgressiveConfig(max_num_out_points=16, fused_train=True,
                              fused_mode="exact"), 128, rng)
        ae_sampler = make_recon_sampler(
            SampleNetAEConfig(num_out_points=8, fused_train=True,
                              fused_mode="exact"))
        ae, _ = create_ae_state(
            AEConfig(num_points=128, n_sample_points=128, fused_train=True,
                     fused_mode="exact"), rng)
        for mod in (cls_sampler, reg_sampler, prog_sampler, ae_sampler, ae):
            assert mod.fused_mode == "exact"
