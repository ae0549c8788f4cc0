"""Reconstruction track tests: AE forward/losses, sampler-vs-AE steps, NRE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samplenet_tpu.models.autoencoder import (
    PointNetAE,
    ae_chamfer_loss,
    ae_emd_loss,
    ae_per_cloud_chamfer,
)
from samplenet_tpu.train.reconstruction import (
    AEConfig,
    SampleNetAEConfig,
    create_ae_state,
    create_sampler_ae_state,
    evaluate_nre,
    make_ae_eval_step,
    make_ae_train_step,
    make_sampler_ae_eval_step,
    make_sampler_ae_train_step,
)
from samplenet_tpu.train.state import clone_state


@pytest.fixture(scope="module")
def ae_setup():
    cfg = AEConfig(num_points=64, bottleneck_size=32, batch_size=4,
                   n_sample_points=64)
    model, state = create_ae_state(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(4, 64, 3), jnp.float32)
    return cfg, model, state, x


class TestPointNetAE:
    def test_forward_shapes(self, ae_setup):
        _, model, state, x = ae_setup
        recon = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, training=False)
        assert recon.shape == (4, 64, 3)

    def test_encode_decode_split(self, ae_setup):
        _, model, state, x = ae_setup
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        z = model.apply(variables, x, training=False, method=PointNetAE.encode)
        assert z.shape == (4, 32)
        recon = model.apply(variables, z, method=PointNetAE.decode)
        full = model.apply(variables, x, training=False)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(full), atol=1e-5)

    def test_sort_output_is_permutation(self):
        x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 3), jnp.float32)
        sorted_x = PointNetAE.sort_output(x)
        for b in range(2):
            a = np.sort(np.asarray(x[b]), axis=0)
            s = np.sort(np.asarray(sorted_x[b]), axis=0)
            np.testing.assert_allclose(a, s, atol=1e-6)

    def test_losses_zero_for_identical(self):
        x = jnp.asarray(np.random.RandomState(2).randn(2, 32, 3), jnp.float32)
        assert float(ae_chamfer_loss(x, x)) < 1e-10
        assert float(ae_emd_loss(x, x)) < 1e-2

    def test_emd_fast_tracks_f32(self):
        """--emd-fast (bf16 match levels) must stay within ~1% of the f32
        loss and keep the same gradient direction (ops.matching fast_math;
        wired via AEConfig.emd_fast -> _ae_loss_fn)."""
        from samplenet_tpu.train.reconstruction import _ae_loss_fn

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        y = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        f32 = _ae_loss_fn("emd", False)
        fast = _ae_loss_fn("emd", True)
        l0, g0 = jax.value_and_grad(lambda a: f32(a, y))(x)
        l1, g1 = jax.value_and_grad(lambda a: fast(a, y))(x)
        assert abs(float(l1) - float(l0)) < 0.01 * float(l0)
        cos = float(jnp.sum(g0 * g1) /
                    (jnp.linalg.norm(g0) * jnp.linalg.norm(g1)))
        assert cos > 0.99

    def test_train_step_reduces_loss(self, ae_setup):
        cfg, model, state, x = ae_setup
        step = make_ae_train_step(model, cfg)
        losses = []
        state = clone_state(state)
        for _ in range(30):
            state, loss = step(state, x)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.8

    def test_eval_step_per_cloud(self, ae_setup):
        _, model, state, x = ae_setup
        eval_step = make_ae_eval_step(model)
        per_cloud = eval_step(state, x)
        assert per_cloud.shape == (4,)
        assert bool(jnp.isfinite(per_cloud).all())

    def test_denoising_train_step(self, ae_setup):
        """Noisy->clean training (split x/gt, autoencoder.py:121-129): the
        loss is scored against the clean gt, so feeding (noisy, clean) must
        differ from plain (noisy) training and still converge."""
        cfg, model, state, x = ae_setup
        step = make_ae_train_step(model, cfg)
        rng = np.random.RandomState(9)
        losses = []
        state = clone_state(state)
        for _ in range(30):
            noisy = x + 0.02 * jnp.asarray(rng.randn(*x.shape), jnp.float32)
            state, loss = step(state, noisy, x)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.8
        assert all(np.isfinite(losses))

    def test_fused_train_encoder_step(self):
        """AE train step with the ghost-BN fused encoder (`--fused-train`):
        at B == block_b the ghost statistics ARE the global batch
        statistics, so loss and EMA must track the plain XLA chain."""
        cfg = AEConfig(num_points=128, bottleneck_size=32, batch_size=4,
                       n_sample_points=128, fused_train=True)
        model, state = create_ae_state(cfg, jax.random.PRNGKey(0))
        assert model.fused_train
        plain, _ = create_ae_state(
            AEConfig(num_points=128, bottleneck_size=32, batch_size=4,
                     n_sample_points=128), jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.RandomState(3).randn(4, 128, 3),
                        jnp.float32)
        fused_step = make_ae_train_step(model, cfg)
        plain_step = make_ae_train_step(plain, cfg)
        s_f, loss_f = fused_step(clone_state(state), x)
        s_p, loss_p = plain_step(clone_state(state), x)
        assert np.isfinite(float(loss_f))
        np.testing.assert_allclose(float(loss_f), float(loss_p), rtol=2e-2)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-3),
            s_f.batch_stats, s_p.batch_stats)


class TestSampleNetAE:
    @pytest.fixture(scope="class")
    def setup(self):
        acfg = AEConfig(num_points=64, bottleneck_size=32, batch_size=4,
                        n_sample_points=64)
        ae, astate = create_ae_state(acfg, jax.random.PRNGKey(0))
        ae_vars = {"params": astate.params, "batch_stats": astate.batch_stats}
        scfg = SampleNetAEConfig(num_out_points=16, group_size=4, batch_size=4)
        sampler, sstate = create_sampler_ae_state(scfg, 64, jax.random.PRNGKey(1))
        x = jnp.asarray(np.random.RandomState(3).randn(4, 64, 3), jnp.float32)
        return scfg, sampler, sstate, ae, ae_vars, x

    def test_train_step(self, setup):
        scfg, sampler, state, ae, ae_vars, x = setup
        step = make_sampler_ae_train_step(sampler, ae, ae_vars, scfg)
        state, metrics = step(clone_state(state), x)
        for k in ("loss", "ae", "simplification", "projection"):
            assert np.isfinite(float(metrics[k])), k
        assert float(metrics["projection"]) > 0

    def test_eval_and_nre(self, setup):
        scfg, sampler, state, ae, ae_vars, x = setup
        eval_step = make_sampler_ae_eval_step(sampler, ae, ae_vars)
        report = evaluate_nre(eval_step, state, np.asarray(x), 4)
        assert report["nre"] > 0
        assert report["loss_sampled_mean"] >= 0

    def test_denoising_sampler_step_and_noisy_nre(self, setup):
        """is_denoising: sampler consumes the corrupted cloud, AE loss
        targets the clean one (2w simplification weight); NRE supports a
        noise_fn that corrupts inputs while scoring against clean."""
        scfg_d = SampleNetAEConfig(num_out_points=16, group_size=4,
                                   batch_size=4, is_denoising=True)
        _, sampler, state, ae, ae_vars, x = setup
        step = make_sampler_ae_train_step(sampler, ae, ae_vars, scfg_d)
        rng = np.random.RandomState(10)
        noisy = x + 0.02 * jnp.asarray(rng.randn(*x.shape), jnp.float32)
        state2, metrics = step(clone_state(state), noisy, x)
        assert np.isfinite(float(metrics["loss"]))
        eval_step = make_sampler_ae_eval_step(sampler, ae, ae_vars)
        nrng = np.random.RandomState(11)
        report = evaluate_nre(
            eval_step, state2, np.asarray(x), 4,
            noise_fn=lambda b: b + 0.02 * nrng.randn(*b.shape).astype("f4"))
        assert report["nre"] > 0 and np.isfinite(report["nre"])

    def test_recon_sampler_has_no_fc_bn(self, setup):
        _, sampler, state, *_ = setup
        fcs = state.params["simplifier"]["fcs"]
        assert not any(k.startswith("bn") for k in fcs), list(fcs)


class TestNREComputation:
    def test_nre_identity(self):
        """NRE == 1 when sampled and full reconstructions coincide."""
        losses = np.array([0.5, 0.7])
        assert float(losses.mean() / losses.mean()) == 1.0

    def test_per_cloud_chamfer_matches_total(self):
        rng = np.random.RandomState(4)
        a = jnp.asarray(rng.randn(3, 16, 3), jnp.float32)
        b = jnp.asarray(rng.randn(3, 24, 3), jnp.float32)
        per = ae_per_cloud_chamfer(a, b)
        total = ae_chamfer_loss(a, b)
        assert float(jnp.mean(per)) == pytest.approx(float(total), rel=1e-5)


class TestAEAnalysis:
    @pytest.fixture(scope="class")
    def ae(self):
        cfg = AEConfig(num_points=32, bottleneck_size=16, batch_size=4,
                       n_sample_points=32)
        model, state = create_ae_state(cfg, jax.random.PRNGKey(0))
        return model, {"params": state.params, "batch_stats": state.batch_stats}

    def test_latent_interpolation_endpoints(self, ae):
        from samplenet_tpu.models import ae_analysis as A
        model, ae_vars = ae
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(32, 3), jnp.float32)
        y = jnp.asarray(rng.randn(32, 3), jnp.float32)
        line = A.interpolate(model, ae_vars, x, y, steps=3)
        assert line.shape == (5, 32, 3)
        zx = A.transform(model, ae_vars, x[None])
        np.testing.assert_allclose(
            np.asarray(line[0]), np.asarray(A.decode(model, ae_vars, zx))[0],
            atol=1e-5)

    def test_match_samples_identity(self):
        from samplenet_tpu.models import ae_analysis as A
        rng = np.random.RandomState(1)
        s = jnp.asarray(rng.randn(1, 16, 3), jnp.float32)
        matched = A.match_samples(s, s)
        np.testing.assert_allclose(np.asarray(matched), np.asarray(s), atol=1e-5)

    def test_interpolate_samples_shape(self):
        from samplenet_tpu.models import ae_analysis as A
        rng = np.random.RandomState(2)
        s1 = jnp.asarray(rng.randn(16, 3), jnp.float32)
        s2 = jnp.asarray(rng.randn(16, 3), jnp.float32)
        out = A.interpolate_samples(s1, s2, steps=2)
        assert out.shape == (4, 16, 3)
        np.testing.assert_allclose(np.asarray(out[-1]), np.asarray(s2), atol=1e-6)

    def test_critical_idx_shape(self, ae):
        from samplenet_tpu.models import ae_analysis as A
        model, ae_vars = ae
        x = jnp.asarray(np.random.RandomState(3).randn(2, 32, 3), jnp.float32)
        idx = A.critical_idx(model, ae_vars, x)
        assert idx.shape == (2, 16)
        assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 32).all()

    def test_reconstructions_from_sampled(self, ae):
        from samplenet_tpu.models import ae_analysis as A
        model, ae_vars = ae
        sampled = np.random.RandomState(4).randn(6, 32, 3).astype(np.float32)
        recon = A.reconstructions_from_sampled(model, ae_vars, sampled,
                                               batch_size=4)
        assert recon.shape == (6, 32, 3)


class TestNonSampled:
    def test_complement(self):
        from samplenet_tpu.ops import non_sampled
        idx = jnp.asarray([[1, 3], [0, 5]], jnp.int32)
        comp = np.asarray(non_sampled(6, idx))
        np.testing.assert_array_equal(comp[0], [0, 2, 4, 5])
        np.testing.assert_array_equal(comp[1], [1, 2, 3, 4])


class TestConvDecoder:
    def test_shapes_and_grads(self):
        from samplenet_tpu.models.autoencoder import ConvDecoder
        dec = ConvDecoder(num_output_points=32)
        z = jnp.asarray(np.random.RandomState(5).randn(2, 16), jnp.float32)
        v = dec.init(jax.random.PRNGKey(0), z, training=False)
        out, _ = dec.apply(v, z, training=True, mutable=["batch_stats"])
        assert out.shape == (2, 32, 3)
        g = jax.grad(lambda p: jnp.sum(dec.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, z,
            training=False) ** 2))(v["params"])
        assert all(bool(jnp.isfinite(x).all())
                   for x in jax.tree_util.tree_leaves(g))


class TestSoftAssignmentLoss:
    """ae_soft_assignment_loss: adaptive softmin matching (beyond-reference
    loss; our TPU-native formulation — see PAPERS.md APML references)."""

    def _clouds(self, seed=11, b=3, n=48, m=40):
        rng = np.random.RandomState(seed)
        return (jnp.asarray(rng.randn(b, n, 3), jnp.float32),
                jnp.asarray(rng.randn(b, m, 3), jnp.float32))

    def test_upper_bounds_chamfer(self):
        from samplenet_tpu.models.autoencoder import (
            ae_chamfer_loss, ae_soft_assignment_loss)
        x, gt = self._clouds()
        soft = float(ae_soft_assignment_loss(x, gt))
        hard = float(ae_chamfer_loss(x, gt))
        assert soft >= hard - 1e-6  # softmin-average >= hard min

    def test_sharp_limit_is_chamfer(self):
        from samplenet_tpu.models.autoencoder import (
            ae_chamfer_loss, ae_soft_assignment_loss)
        x, gt = self._clouds(seed=12)
        soft = float(ae_soft_assignment_loss(x, gt, tau_scale=1e-4,
                                             tau_floor=1e-8))
        hard = float(ae_chamfer_loss(x, gt))
        np.testing.assert_allclose(soft, hard, rtol=1e-3)

    def test_identical_clouds_near_zero(self):
        from samplenet_tpu.models.autoencoder import ae_soft_assignment_loss
        x, _ = self._clouds(seed=13, m=48)
        assert float(ae_soft_assignment_loss(x, x)) < 1e-2

    def test_permutation_invariant_and_grads(self):
        from samplenet_tpu.models.autoencoder import ae_soft_assignment_loss
        x, gt = self._clouds(seed=14)
        perm = np.random.RandomState(0).permutation(gt.shape[1])
        a = float(ae_soft_assignment_loss(x, gt))
        b = float(ae_soft_assignment_loss(x, gt[:, perm]))
        np.testing.assert_allclose(a, b, rtol=1e-5)
        g = jax.grad(lambda q: ae_soft_assignment_loss(q, gt))(x)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.max(jnp.abs(g))) > 0

    def test_train_step_dispatch(self, ae_setup):
        """AEConfig(loss='softassign') trains one step with finite loss."""
        from samplenet_tpu.train.reconstruction import (
            AEConfig, create_ae_state, make_ae_train_step)
        cfg = AEConfig(num_points=64, n_sample_points=64, batch_size=4,
                       loss="softassign")
        ae, state = create_ae_state(cfg, jax.random.PRNGKey(0))
        step = make_ae_train_step(ae, cfg)
        x = jnp.asarray(np.random.RandomState(1).randn(4, 64, 3), jnp.float32)
        state, loss = step(state, x)
        assert bool(jnp.isfinite(loss))
