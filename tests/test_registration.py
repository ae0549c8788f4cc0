"""Registration track tests: quaternion algebra, rigid transforms, PCRNet,
and the train/eval step contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samplenet_tpu.geometry import (
    QuaternionTransform,
    create_random_transform,
    euler_to_quaternion,
    expmap_to_quaternion,
    qeuler,
    qfix,
    qinv,
    qmul,
    qrot,
    quaternion_to_rotation_matrix,
)
from samplenet_tpu.data.qdataset import QuaternionFixedDataset
from samplenet_tpu.models.pcrnet import PCRNet
from samplenet_tpu.train.registration import (
    RegistrationConfig,
    create_pcrnet_state,
    create_sampler_state,
    make_eval_step,
    make_pcrnet_train_step,
    make_sampler_train_step,
    precision_auc,
    sampling_consistency,
)
from samplenet_tpu.train.state import clone_state


def rand_unit_quat(rng, shape=()):
    q = rng.randn(*shape, 4)
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


class TestQuaternion:
    def test_qmul_identity(self):
        rng = np.random.RandomState(0)
        q = rand_unit_quat(rng, (5,))
        ident = np.tile([1, 0, 0, 0], (5, 1)).astype(np.float32)
        np.testing.assert_allclose(qmul(ident, q), q, atol=1e-6)
        np.testing.assert_allclose(qmul(q, ident), q, atol=1e-6)

    def test_qmul_matches_rotation_composition(self):
        rng = np.random.RandomState(1)
        q1, q2 = rand_unit_quat(rng, (4,)), rand_unit_quat(rng, (4,))
        r1 = quaternion_to_rotation_matrix(jnp.asarray(q1))
        r2 = quaternion_to_rotation_matrix(jnp.asarray(q2))
        q12 = qmul(jnp.asarray(q1), jnp.asarray(q2))
        r12 = quaternion_to_rotation_matrix(q12)
        np.testing.assert_allclose(
            np.asarray(r12), np.einsum("bij,bjk->bik", r1, r2), atol=1e-5)

    def test_qrot_matches_matrix(self):
        rng = np.random.RandomState(2)
        q = rand_unit_quat(rng, (6,))
        v = rng.randn(6, 3).astype(np.float32)
        got = qrot(jnp.asarray(q), jnp.asarray(v))
        r = quaternion_to_rotation_matrix(jnp.asarray(q))
        exp = np.einsum("bij,bj->bi", np.asarray(r), v)
        np.testing.assert_allclose(np.asarray(got), exp, atol=1e-5)

    def test_qinv_roundtrip(self):
        rng = np.random.RandomState(3)
        q = jnp.asarray(rand_unit_quat(rng, (5,)))
        v = jnp.asarray(rng.randn(5, 3).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(qrot(qinv(q), qrot(q, v))), np.asarray(v), atol=1e-5)

    def test_euler_quaternion_roundtrip(self):
        rng = np.random.RandomState(4)
        e = rng.uniform(-0.5, 0.5, (8, 3)).astype(np.float32)
        q = euler_to_quaternion(jnp.asarray(e), "xyz")
        # unit norm
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-5)
        e2 = qeuler(q, "xyz")
        np.testing.assert_allclose(np.asarray(e2), e, atol=1e-4)

    def test_expmap(self):
        e = jnp.asarray([[0.0, 0.0, 0.0], [np.pi, 0.0, 0.0]], jnp.float32)
        q = np.asarray(expmap_to_quaternion(e))
        np.testing.assert_allclose(q[0], [1, 0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(q[1], [0, 1, 0, 0], atol=1e-6)

    def test_qfix_continuity(self):
        q = np.array([[[1, 0, 0, 0.0]], [[-1, 0, 0, 0]], [[1, 0, 0, 0]]])
        fixed = qfix(q)
        dots = np.sum(fixed[1:] * fixed[:-1], axis=-1)
        assert (dots >= 0).all()


class TestQuaternionTransform:
    def test_rotate_inverse_roundtrip(self):
        rng = np.random.RandomState(5)
        vec = np.concatenate(
            [rand_unit_quat(rng, (3,)), np.zeros((3, 3), np.float32)], -1)
        t = QuaternionTransform(jnp.asarray(vec))
        p = jnp.asarray(rng.randn(3, 100, 3).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(t.inverse().rotate(t.rotate(p))), np.asarray(p), atol=1e-5)

    def test_compute_errors_zero_for_identical(self):
        rng = np.random.RandomState(6)
        vec = jnp.asarray(np.concatenate(
            [rand_unit_quat(rng, (4,)), rng.randn(4, 3).astype(np.float32)], -1))
        t = QuaternionTransform(vec)
        rot, norm, trans = t.compute_errors(t)
        assert float(rot) < 1e-2 and float(norm) < 1e-9 and float(trans) < 1e-9

    def test_rotation_error_known_angle(self):
        # The reference uses the PCN formula 2*acos(2<q1,q2>^2 - 1)
        # (qdataset.py:85), which evaluates to TWICE the geodesic angle:
        # for 90deg about x vs identity it reports pi, not pi/2. Metric
        # parity means reproducing that convention.
        q1 = jnp.asarray([[1.0, 0, 0, 0, 0, 0, 0]])
        half = np.cos(np.pi / 4), np.sin(np.pi / 4)
        q2 = jnp.asarray([[half[0], half[1], 0, 0, 0, 0, 0]], jnp.float32)
        rot, _, _ = QuaternionTransform(q1).compute_errors(QuaternionTransform(q2))
        assert float(rot) == pytest.approx(np.pi, rel=1e-3)

    def test_pytree_through_jit(self):
        vec = jnp.asarray([[1.0, 0, 0, 0, 0.1, 0.2, 0.3]])
        out = jax.jit(lambda t: t.inverse().vec)(QuaternionTransform(vec))
        np.testing.assert_allclose(
            np.asarray(out), [[1, 0, 0, 0, -0.1, -0.2, -0.3]], atol=1e-6)


class TestQDataset:
    def test_deterministic_per_index(self):
        data = np.random.RandomState(7).randn(4, 64, 3).astype(np.float32)
        ds1 = QuaternionFixedDataset(data, repeat=2, seed=0)
        ds2 = QuaternionFixedDataset(data, repeat=2, seed=0)
        p0a, p1a, ta = ds1[3]
        p0b, p1b, tb = ds2[3]
        np.testing.assert_allclose(p1a, p1b)
        np.testing.assert_allclose(ta, tb)
        assert len(ds1) == 8

    def test_rotation_preserves_norms(self):
        data = np.random.RandomState(8).randn(2, 64, 3).astype(np.float32)
        ds = QuaternionFixedDataset(data, seed=0)
        p0, p1, _ = ds[0]
        np.testing.assert_allclose(
            np.linalg.norm(p0, axis=-1), np.linalg.norm(p1, axis=-1), atol=1e-4)

    def test_gt_twist_maps_p0_to_p1(self):
        data = np.random.RandomState(9).randn(2, 32, 3).astype(np.float32)
        ds = QuaternionFixedDataset(data, seed=0)
        p0, p1, tw = ds[1]
        t = QuaternionTransform(jnp.asarray(tw[None]))
        np.testing.assert_allclose(
            np.asarray(t.rotate(jnp.asarray(p0[None])))[0], p1, atol=1e-5)


class TestPCRNet:
    def test_twist_quat_normalized(self):
        model = PCRNet(bottleneck_size=128)
        rng = np.random.RandomState(10)
        p0 = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
        p1 = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), p0, p1)
        twist, pre = model.apply(v, p0, p1)
        assert twist.shape == (2, 7) and pre.shape == (2, 4)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(twist)[:, :4], axis=-1), 1.0, atol=1e-5)


class TestRegistrationSteps:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = RegistrationConfig(num_points=64, num_out_points=16,
                                 bottleneck_size=32, group_size=4, batch_size=4)
        pcrnet, pstate = create_pcrnet_state(cfg, jax.random.PRNGKey(0))
        data = np.random.RandomState(11).randn(8, 64, 3).astype(np.float32)
        ds = QuaternionFixedDataset(data, seed=0)
        return cfg, pcrnet, pstate, ds

    def test_pcrnet_train_step_decreases_nothing_nan(self, setup):
        cfg, pcrnet, state, ds = setup
        step = make_pcrnet_train_step(pcrnet, cfg)
        p0, p1, tw = next(ds.batches(4, shuffle=False))
        state, info = step(clone_state(state), jnp.asarray(p0),
                           jnp.asarray(p1), jnp.asarray(tw))
        assert np.isfinite(float(info["loss"]))
        assert float(info["rot_err_deg"]) >= 0

    def test_sampler_train_and_eval_steps(self, setup):
        cfg, pcrnet, pstate, ds = setup
        pcr_vars = {"params": pstate.params}
        sampler, sstate = create_sampler_state(cfg, jax.random.PRNGKey(1))
        step = make_sampler_train_step(sampler, pcrnet, pcr_vars, cfg)
        p0, p1, tw = next(ds.batches(4, shuffle=False))
        sstate, info = step(clone_state(sstate), jnp.asarray(p0),
                            jnp.asarray(p1), jnp.asarray(tw))
        assert np.isfinite(float(info["loss"]))
        assert float(info["simplification_loss"]) > 0
        eval_step = make_eval_step(sampler, pcrnet, pcr_vars, cfg)
        svars = {"params": sstate.params, "batch_stats": sstate.batch_stats}
        rot, trans, cons = eval_step(svars, jnp.asarray(p0), jnp.asarray(p1),
                                     jnp.asarray(tw))
        assert rot.shape == (4,)  # per-sample rotation errors
        assert cons.shape == (4,)  # per-sample consistency (padding sliceable)
        assert bool(jnp.isfinite(rot).all())
        assert bool(jnp.isfinite(cons).all())

    def test_evaluate_batch_size_independent(self, setup):
        """Pad-and-slice discipline: every metric (incl. consistency, which
        used to average over the padded batch) is identical whether the test
        set divides the batch size (4 | 8) or not (3)."""
        from samplenet_tpu.train.registration import evaluate

        cfg, pcrnet, pstate, ds = setup
        pcr_vars = {"params": pstate.params}
        eval_step = make_eval_step(None, pcrnet, pcr_vars, cfg)
        r4 = evaluate(eval_step, None, ds, 4)
        r3 = evaluate(eval_step, None, ds, 3)
        for key in ("rot_err_mean", "rot_err_std", "auc", "consistency_mean"):
            assert r4[key] == pytest.approx(r3[key], rel=1e-5), key

    def test_consistency_zero_for_perfect_sampling(self):
        """If both sampled clouds are the same points under the gt transform,
        consistency must be ~0."""
        rng = np.random.RandomState(12)
        p0s = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
        vec = np.concatenate(
            [rand_unit_quat(rng, (2,)), np.zeros((2, 3), np.float32)], -1)
        t = QuaternionTransform(jnp.asarray(vec))
        p1s = t.rotate(p0s)
        c = sampling_consistency(p0s, p1s, jnp.asarray(vec))
        assert c.shape == (2,)
        assert float(jnp.max(c)) < 1e-8

    def test_precision_auc(self):
        errs = np.array([0.0, 10.0, 200.0])
        curve, auc = precision_auc(errs)
        assert curve[0] == pytest.approx(1 / 3)
        assert curve[-1] == pytest.approx(2 / 3)
        assert 0 < auc < 1


class TestIterativeRegistration:
    def test_single_iteration_matches_direct(self):
        from samplenet_tpu.train.registration import register_iterative
        cfg = RegistrationConfig(num_points=64, batch_size=4)
        pcrnet, state = create_pcrnet_state(cfg, jax.random.PRNGKey(0))
        pcr_vars = {"params": state.params}
        rng = np.random.RandomState(20)
        p0 = jnp.asarray(rng.randn(4, 64, 3), jnp.float32)
        p1 = jnp.asarray(rng.randn(4, 64, 3), jnp.float32)
        est1 = register_iterative(pcrnet, pcr_vars, p0, p1, 1)
        twist, _ = pcrnet.apply(pcr_vars, p0, p1)
        np.testing.assert_allclose(np.asarray(est1.vec[:, :4]),
                                   np.asarray(twist[:, :4]), atol=1e-5)

    def test_composition_is_unit_quaternion(self):
        from samplenet_tpu.train.registration import register_iterative
        cfg = RegistrationConfig(num_points=64, batch_size=4)
        pcrnet, state = create_pcrnet_state(cfg, jax.random.PRNGKey(1))
        pcr_vars = {"params": state.params}
        rng = np.random.RandomState(21)
        p0 = jnp.asarray(rng.randn(4, 64, 3), jnp.float32)
        p1 = jnp.asarray(rng.randn(4, 64, 3), jnp.float32)
        est3 = register_iterative(pcrnet, pcr_vars, p0, p1, 3)
        norms = np.linalg.norm(np.asarray(est3.vec[:, :4]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_eval_step_with_iterations(self):
        cfg = RegistrationConfig(num_points=64, num_out_points=16,
                                 bottleneck_size=32, group_size=4,
                                 batch_size=4)
        pcrnet, state = create_pcrnet_state(cfg, jax.random.PRNGKey(2))
        pcr_vars = {"params": state.params}
        step = make_eval_step(None, pcrnet, pcr_vars, cfg, iterations=2)
        rng = np.random.RandomState(22)
        p0 = jnp.asarray(rng.randn(4, 64, 3), jnp.float32)
        p1 = jnp.asarray(rng.randn(4, 64, 3), jnp.float32)
        tw = jnp.tile(jnp.asarray([[1.0, 0, 0, 0, 0, 0, 0]]), (4, 1))
        rot, trans, cons = step(None, p0, p1, tw)
        assert rot.shape == (4,)
        assert bool(jnp.isfinite(rot).all())

    def test_iteration_matched_train_step(self):
        """train_iterations=2 composes passes inside the loss and still
        produces finite grads through both (the original PCRNet protocol)."""
        from samplenet_tpu.train.registration import make_pcrnet_train_step
        cfg = RegistrationConfig(num_points=64, batch_size=4,
                                 train_iterations=2)
        pcrnet, state = create_pcrnet_state(cfg, jax.random.PRNGKey(3))
        step = make_pcrnet_train_step(pcrnet, cfg)
        rng = np.random.RandomState(23)
        p0 = jnp.asarray(rng.randn(4, 64, 3), jnp.float32)
        p1 = jnp.asarray(rng.randn(4, 64, 3), jnp.float32)
        tw = jnp.tile(jnp.asarray([[1.0, 0, 0, 0, 0, 0, 0]]), (4, 1))
        state2, info = step(state, p0, p1, tw)
        assert bool(jnp.isfinite(info["loss"]))
        # params actually moved (grads flowed through the composition)
        leaf0 = jax.tree_util.tree_leaves(state2.params)[0]
        assert bool(jnp.isfinite(leaf0).all())
