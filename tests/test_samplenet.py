"""Sampler-core tests: soft projection golden fixtures + SampleNet contract.

The golden fixture clouds/expectations reproduce the executable smoke test
embedded in the reference (registration/src/soft_projection.py:158-284 and
classification/soft_projection.py:86-161) as pytest cases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samplenet_tpu.models import (
    SampleNet,
    SoftProjection,
    FPSSampler,
    RandomSampler,
    simplification_loss,
    sigma_from_temperature,
)

QUERY_CLOUD = np.array(
    [[1, 0, 0], [0, 1, 0], [0, 0, 1],
     [5, 4, 4], [4, 5, 4], [4, 4, 5],
     [8, 7, 7], [7, 8, 7], [7, 7, 8]], dtype=np.float32)

POINT_CLOUD = np.array(
    [[0, 0, 0], [1, 0, 0], [2, 0, 0], [5, 5, 5], [7, 7, 8], [7, 7, 8.5]],
    dtype=np.float32)

POINT_FEATURES = np.arange(1, 31, dtype=np.float32).reshape(6, 5)

# k=3, t=1.0 soft-propagated features of QUERY points from POINT_CLOUD feats
EXPECTED_FEATURES_NN_3 = np.array(
    [[6.0, 7.0, 8.0, 9.0, 10.0],
     [2.459, 3.459, 4.459, 5.459, 6.459],
     [2.459, 3.459, 4.459, 5.459, 6.459],
     [16.0, 17.0, 18.0, 19.0, 20.0],
     [16.0, 17.0, 18.0, 19.0, 20.0],
     [16.0, 17.0, 18.0, 19.0, 20.0],
     [22.113, 23.113, 24.113, 25.113, 26.113],
     [22.113, 23.113, 24.113, 25.113, 26.113],
     [23.189, 24.189, 25.189, 26.189, 27.189]], dtype=np.float32)

# k=3, t=0.1 projection of POINT_CLOUD onto QUERY_CLOUD neighbourhoods
EXPECTED_NN_CLOUD = np.array(
    [[0.333, 0.333, 0.333],
     [1, 0, 0],
     [1, 0, 0],
     [4.333, 4.333, 4.333],
     [7, 7, 8],
     [7, 7, 8]], dtype=np.float32)


def _init_projection(k, t, **kw):
    proj = SoftProjection(group_size=k, initial_temperature=t,
                          min_sigma=1e-4, **kw)
    variables = proj.init(
        jax.random.PRNGKey(0), POINT_CLOUD[None], QUERY_CLOUD[None],
        method=SoftProjection.project)
    return proj, variables


class TestSoftProjectionGolden:
    def test_propagate_matches_reference_fixture(self):
        proj, variables = _init_projection(3, 1.0)
        out = proj.apply(
            variables, POINT_CLOUD[None], POINT_FEATURES[None], QUERY_CLOUD[None],
            method=SoftProjection.propagate)
        np.testing.assert_allclose(
            np.asarray(out)[0], EXPECTED_FEATURES_NN_3, atol=2e-3)

    def test_project_matches_reference_fixture(self):
        # roles swapped + low temperature, as in the reference __main__
        proj, variables = _init_projection(3, 0.1)
        out, _, _ = proj.apply(
            variables, QUERY_CLOUD[None], POINT_CLOUD[None],
            method=SoftProjection.project)
        np.testing.assert_allclose(np.asarray(out)[0], EXPECTED_NN_CLOUD, atol=2e-3)

    def test_project_and_propagate_consistent(self):
        proj, variables = _init_projection(3, 1.0)
        pts, feats = proj.apply(
            variables, POINT_CLOUD[None], POINT_FEATURES[None], QUERY_CLOUD[None],
            method=SoftProjection.project_and_propagate)
        only_feats = proj.apply(
            variables, POINT_CLOUD[None], POINT_FEATURES[None], QUERY_CLOUD[None],
            method=SoftProjection.propagate)
        np.testing.assert_allclose(np.asarray(feats), np.asarray(only_feats))

    def test_hard_mode_snaps_to_nearest(self):
        proj, variables = _init_projection(3, 1.0)
        out, w, _ = proj.apply(
            variables, QUERY_CLOUD[None], POINT_CLOUD[None],
            method=SoftProjection.project, hard=True)
        # hard weights are one-hot
        np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-6)
        assert (np.asarray(w).max(-1) == 1.0).all()
        # each projected point is some query point (convex hull corner)
        out = np.asarray(out)[0]
        for p in out:
            assert min(np.sum((QUERY_CLOUD - p) ** 2, 1)) < 1e-10


class TestSigmaModes:
    def test_torch_clamps_squared(self):
        assert float(sigma_from_temperature(jnp.asarray(0.001), "torch", 1e-2)) == pytest.approx(1e-2)
        assert float(sigma_from_temperature(jnp.asarray(2.0), "torch", 1e-2)) == pytest.approx(4.0)

    def test_tf_no_clamp(self):
        assert float(sigma_from_temperature(jnp.asarray(0.001), "tf", 1e-2)) == pytest.approx(1e-6)

    def test_recon_clamps_then_squares(self):
        assert float(sigma_from_temperature(jnp.asarray(0.001), "recon", 1e-2)) == pytest.approx(1e-4)


class TestSampleNet:
    @pytest.fixture(scope="class")
    def net_and_vars(self):
        net = SampleNet(num_out_points=16, bottleneck_size=64, group_size=4)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 128, 3), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x, training=False)
        return net, variables, x

    def test_train_forward_shapes(self, net_and_vars):
        net, variables, x = net_and_vars
        (simp, proj), updates = net.apply(
            variables, x, training=True, mutable=["batch_stats"])
        assert simp.shape == (2, 16, 3)
        assert proj.shape == (2, 16, 3)
        assert "batch_stats" in updates

    def test_eval_returns_matched_input_points(self, net_and_vars):
        net, variables, x = net_and_vars
        simp, match = jax.jit(
            lambda v, x: net.apply(v, x, training=False))(variables, x)
        assert match.shape == (2, 16, 3)
        xs = np.asarray(x)
        for b in range(2):
            for p in np.asarray(match)[b]:
                assert min(np.sum((xs[b] - p) ** 2, 1)) < 1e-9

    def test_eval_points_unique_with_complete_fps(self, net_and_vars):
        net, variables, x = net_and_vars
        _, match = net.apply(variables, x, training=False)
        m = np.asarray(match)
        for b in range(2):
            assert len(np.unique(m[b], axis=0)) == 16

    def test_bcn_layout(self):
        net = SampleNet(num_out_points=8, bottleneck_size=32, group_size=4,
                        input_shape="bcn", output_shape="bcn")
        x = jnp.asarray(np.random.RandomState(1).randn(2, 3, 64), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x, training=False)
        (simp, proj), _ = net.apply(variables, x, training=True,
                                    mutable=["batch_stats"])
        assert simp.shape == (2, 3, 8)
        assert proj.shape == (2, 3, 8)

    def test_skip_projection_returns_simplified(self):
        net = SampleNet(num_out_points=8, bottleneck_size=32, group_size=4,
                        skip_projection=True)
        x = jnp.asarray(np.random.RandomState(2).randn(2, 64, 3), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x, training=False)
        (simp, proj), _ = net.apply(variables, x, training=True,
                                    mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(simp), np.asarray(proj))

    def test_simplification_loss_value(self):
        rng = np.random.RandomState(3)
        ref = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        samp = jnp.asarray(rng.randn(2, 16, 3), jnp.float32)
        loss = simplification_loss(ref, samp, 16, gamma=0.5, delta=1 / 30)
        d_sr = np.min(((np.asarray(samp)[:, :, None] - np.asarray(ref)[:, None]) ** 2).sum(-1), 2)
        d_rs = np.min(((np.asarray(ref)[:, :, None] - np.asarray(samp)[:, None]) ** 2).sum(-1), 2)
        exp = d_sr.mean() + d_sr.max(1).mean() + (0.5 + 16 / 30) * d_rs.mean()
        assert float(loss) == pytest.approx(exp, rel=1e-4)

    def test_gradients_flow_to_all_params(self, net_and_vars):
        net, variables, x = net_and_vars

        def loss_fn(params):
            (simp, proj), _ = net.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, training=True, mutable=["batch_stats"])
            return jnp.sum(proj**2) + jnp.sum(simp**2)

        grads = jax.grad(loss_fn)(variables["params"])
        flat = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.isfinite(g).all()) for g in flat)
        # temperature gradient specifically must be nonzero
        t_grad = grads["project"]["temperature"]
        assert float(jnp.abs(t_grad)) > 0


class TestBaselineSamplers:
    def test_fps_sampler(self):
        net = FPSSampler(num_out_points=8)
        x = jnp.asarray(np.random.RandomState(4).randn(2, 64, 3), jnp.float32)
        variables = net.init({"params": jax.random.PRNGKey(0),
                              "sampler": jax.random.PRNGKey(1)}, x)
        y, _ = net.apply(variables, x, rngs={"sampler": jax.random.PRNGKey(2)})
        assert y.shape == (2, 8, 3)
        ys, xs = np.asarray(y), np.asarray(x)
        for b in range(2):
            assert len(np.unique(ys[b], axis=0)) == 8
            for p in ys[b]:
                assert min(np.sum((xs[b] - p) ** 2, 1)) < 1e-9

    def test_random_sampler(self):
        net = RandomSampler(num_out_points=8)
        x = jnp.asarray(np.random.RandomState(5).randn(2, 64, 3), jnp.float32)
        variables = net.init({"params": jax.random.PRNGKey(0),
                              "sampler": jax.random.PRNGKey(1)}, x)
        y, _ = net.apply(variables, x, rngs={"sampler": jax.random.PRNGKey(2)})
        assert y.shape == (2, 8, 3)


class TestBNSchedule:
    def test_decay_ramps_and_clips(self):
        from samplenet_tpu.train.state import bn_decay_schedule
        import jax.numpy as jnp
        d0 = float(bn_decay_schedule(jnp.asarray(0), 32,
                                     decay_step_samples=1000.0))
        assert d0 == pytest.approx(0.5)
        dlate = float(bn_decay_schedule(jnp.asarray(10000), 32,
                                        decay_step_samples=1000.0))
        assert dlate == pytest.approx(0.99)

    def test_scheduled_update_matches_fixed_momentum(self):
        """With a constant decay, the in-step EMA equals flax BN with the
        same momentum."""
        from samplenet_tpu.train.state import scheduled_bn_update
        import jax.numpy as jnp
        old = {"mean": jnp.asarray([1.0, 2.0]), "var": jnp.asarray([1.0, 1.0])}
        batch = {"mean": jnp.asarray([3.0, 4.0]), "var": jnp.asarray([2.0, 2.0])}
        out = scheduled_bn_update(old, batch, jnp.asarray(0.9))
        np.testing.assert_allclose(np.asarray(out["mean"]),
                                   [0.9 * 1 + 0.1 * 3, 0.9 * 2 + 0.1 * 4])

    def test_train_step_with_schedule_runs(self):
        from samplenet_tpu.train.classification import (
            ClassifierConfig, create_classifier_state,
            make_classifier_train_step)
        cfg = ClassifierConfig(num_classes=4, num_points=32, batch_size=4,
                               bn_schedule=True, augment=False)
        model, state = create_classifier_state(cfg, jax.random.PRNGKey(0))
        step = make_classifier_train_step(model, cfg)
        x = jnp.asarray(np.random.RandomState(0).randn(4, 32, 3), jnp.float32)
        y = jnp.asarray([0, 1, 2, 3])
        state, loss, acc = step(state, x, y, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        # running stats must have moved from init toward batch stats
        leaf = jax.tree_util.tree_leaves(state.batch_stats)[0]
        assert float(jnp.abs(leaf).sum()) > 0


class TestRandomSamplerNoReplacement:
    def test_indices_unique_per_cloud(self):
        net = RandomSampler(num_out_points=64)
        x = jnp.asarray(np.random.RandomState(9).randn(4, 1024, 3), jnp.float32)
        variables = net.init({"params": jax.random.PRNGKey(0),
                              "sampler": jax.random.PRNGKey(1)}, x)
        y, _ = net.apply(variables, x, rngs={"sampler": jax.random.PRNGKey(2)})
        ys = np.asarray(y)
        for b in range(4):
            assert len(np.unique(ys[b], axis=0)) == 64  # no duplicates


class TestBf16Compute:
    def test_bf16_forward_train_and_eval(self):
        """dtype=bf16 SampleNet: finite outputs, eval matching still returns
        real input points (matching runs on f32 indices regardless of the
        network compute dtype)."""
        from samplenet_tpu.models import SampleNet

        net = SampleNet(num_out_points=8, bottleneck_size=32, group_size=4,
                        dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.RandomState(3).randn(2, 64, 3), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x, training=False)
        (simp, proj), _ = net.apply(variables, x, training=True,
                                    mutable=["batch_stats"])
        assert bool(jnp.isfinite(simp).all()) and bool(jnp.isfinite(proj).all())
        simp_e, sampled = net.apply(variables, x, training=False)
        assert sampled.dtype == jnp.float32
        xs = np.asarray(x)
        ss = np.asarray(sampled)
        for b in range(2):
            for p in ss[b]:  # every matched point is an actual input point
                assert np.min(np.sum((xs[b] - p) ** 2, axis=-1)) < 1e-9


class TestConvLayout:
    def test_bcn_chain_is_bit_identical(self):
        """Channel-major (layout='bcn') PointMLP: same param tree, same
        forward/batch-stats/grads as the row-major chain — it is purely a
        memory-layout change (N rides the lanes for C=64 f32 training
        activations)."""
        from samplenet_tpu.nn.layers import PointMLP

        feats = (64, 64, 64, 128, 128)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 96, 3), jnp.float32)
        a = PointMLP(features=feats)
        b = PointMLP(features=feats, layout="bcn")
        v = a.init(jax.random.PRNGKey(0), x, training=False)
        assert (jax.tree.map(lambda t: t.shape, v)
                == jax.tree.map(lambda t: t.shape,
                                b.init(jax.random.PRNGKey(0), x,
                                       training=False)))
        np.testing.assert_array_equal(
            np.asarray(a.apply(v, x, training=False)),
            np.asarray(b.apply(v, x, training=False)))
        oa, ua = a.apply(v, x, training=True, mutable=["batch_stats"])
        ob, ub = b.apply(v, x, training=True, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))
        for la, lb in zip(jax.tree.leaves(ua), jax.tree.leaves(ub)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=1e-6)

    def test_samplenet_accepts_conv_layout(self):
        from samplenet_tpu.models import SampleNet

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        a = SampleNet(num_out_points=8, bottleneck_size=32, group_size=4)
        b = SampleNet(num_out_points=8, bottleneck_size=32, group_size=4,
                      conv_layout="bcn")
        v = a.init(jax.random.PRNGKey(0), x, training=False)
        sa, ma = a.apply(v, x, training=False)
        sb, mb = b.apply(v, x, training=False)
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ma), np.asarray(mb), atol=1e-6)


class TestTrainStepOptions:
    def test_remat_and_bcn_match_baseline(self):
        """SampleNetConfig.remat / conv_layout='bcn' are pure memory
        optimisations: one full optimiser step produces identical loss and
        parameters (CPU, f32)."""
        from samplenet_tpu.models.pointnet_cls import PointNetClassifier
        from samplenet_tpu.train.classification import (
            SampleNetConfig,
            create_samplenet_state,
            make_samplenet_train_step,
        )

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(8, 64, 3), jnp.float32)
        y = jnp.asarray(rng.randint(0, 4, 8), jnp.int32)
        cls = PointNetClassifier(num_classes=4)
        cv = cls.init(jax.random.PRNGKey(1), x[:, :8], training=False)
        results = {}
        for name, opts in {
            "baseline": {},
            "remat": {"remat": True},
            "bcn": {"conv_layout": "bcn"},
            "remat_bcn": {"remat": True, "conv_layout": "bcn"},
        }.items():
            scfg = SampleNetConfig(num_out_points=8, bottleneck_size=32,
                                   group_size=4, batch_size=8, **opts)
            sampler, state = create_samplenet_state(
                scfg, 64, jax.random.PRNGKey(0))
            step = make_samplenet_train_step(sampler, cls, cv, scfg,
                                             augment_data=False)
            s2, m = step(state, x, y, jax.random.PRNGKey(2))
            results[name] = (float(m["loss"]), jax.device_get(s2.params))
        base_loss, base_params = results["baseline"]
        for name, (loss, params) in results.items():
            assert loss == pytest.approx(base_loss, rel=1e-6), name
            for a, b in zip(jax.tree.leaves(base_params),
                            jax.tree.leaves(params)):
                np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)
