"""Progressive (nested sampling) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samplenet_tpu.models.pointnet_cls import PointNetClassifier
from samplenet_tpu.train.progressive import (
    ProgressiveAEConfig,
    ProgressiveConfig,
    create_progressive_state,
    evaluate_prefixes,
    make_progressive_ae_train_step,
    make_progressive_infer_step,
    make_progressive_train_step,
    progressive_sizes,
)
from samplenet_tpu.train.reconstruction import AEConfig, create_ae_state
from samplenet_tpu.train.state import clone_state


def test_progressive_sizes():
    assert progressive_sizes(8, 64) == (8, 16, 32, 64)
    assert progressive_sizes(2, 2) == (2,)


@pytest.fixture(scope="module")
def setup():
    cfg = ProgressiveConfig(max_num_out_points=32, min_num_out_points=8,
                            bottleneck_size=32, group_size=4, batch_size=4)
    sampler, state = create_progressive_state(cfg, 64, jax.random.PRNGKey(0))
    classifier = PointNetClassifier(num_classes=5)
    dummy = jnp.zeros((2, 8, 3), jnp.float32)
    c_vars = classifier.init(jax.random.PRNGKey(1), dummy, training=False)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 64, 3), jnp.float32)
    y = jnp.asarray(rng.randint(0, 5, 4))
    return cfg, sampler, state, classifier, c_vars, x, y


class TestProgressiveTraining:
    def test_train_step_metrics(self, setup):
        cfg, sampler, state, classifier, c_vars, x, y = setup
        step = make_progressive_train_step(sampler, classifier, c_vars, cfg)
        state, metrics = step(clone_state(state), x, y)
        assert np.isfinite(float(metrics["loss"]))
        for s in cfg.sizes:
            assert f"acc@{s}" in metrics

    def test_loss_sums_over_sizes(self, setup):
        """The summed classifier loss must exceed any single-size loss."""
        cfg, sampler, state, classifier, c_vars, x, y = setup
        step = make_progressive_train_step(sampler, classifier, c_vars, cfg)
        _, metrics = step(clone_state(state), x, y)
        # 3 sizes (8,16,32), each loss > 0 -> total > single ln(5) baseline
        assert float(metrics["classifier"]) > np.log(5)


class TestProgressiveInference:
    def test_ordered_outputs(self, setup):
        cfg, sampler, state, classifier, c_vars, x, y = setup
        infer = make_progressive_infer_step(sampler, cfg.max_num_out_points)
        simp, soft, hard, matched = infer(state, x)
        m = cfg.max_num_out_points
        assert simp.shape == soft.shape == hard.shape == (4, m, 3)
        assert matched.shape == (4, m, 3)
        # hard-projected points are real input points
        xs = np.asarray(x)
        for b in range(2):
            for p in np.asarray(hard)[b][:8]:
                assert min(np.sum((xs[b] - p) ** 2, 1)) < 1e-9
        # matched points are unique per cloud (unique + FPS completion)
        for b in range(2):
            assert len(np.unique(np.asarray(matched)[b], axis=0)) == m

    def test_evaluate_prefixes(self, setup):
        cfg, sampler, state, classifier, c_vars, x, y = setup
        infer = make_progressive_infer_step(sampler, cfg.max_num_out_points)
        accs = evaluate_prefixes(
            infer, state, classifier, c_vars,
            np.asarray(x), np.asarray(y), cfg.sizes, batch_size=4)
        assert set(accs) == set(cfg.sizes)
        for v in accs.values():
            assert 0.0 <= v <= 1.0


class TestProgressiveAE:
    def test_ae_variant_averages(self):
        acfg = AEConfig(num_points=64, bottleneck_size=32, batch_size=4,
                        n_sample_points=64)
        ae, astate = create_ae_state(acfg, jax.random.PRNGKey(0))
        ae_vars = {"params": astate.params, "batch_stats": astate.batch_stats}
        pcfg = ProgressiveAEConfig(max_num_out_points=32, min_num_out_points=8,
                                   bottleneck_size=32, group_size=4, batch_size=4)
        from samplenet_tpu.train.progressive import create_progressive_state
        cfg_like = ProgressiveConfig(
            max_num_out_points=32, min_num_out_points=8,
            bottleneck_size=32, group_size=4)
        sampler, state = create_progressive_state(cfg_like, 64,
                                                  jax.random.PRNGKey(2))
        step = make_progressive_ae_train_step(sampler, ae, ae_vars, pcfg)
        x = jnp.asarray(np.random.RandomState(3).randn(4, 64, 3), jnp.float32)
        state, metrics = step(state, x)
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["ae"]) > 0
