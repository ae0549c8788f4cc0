"""Evaluation protocol tests (voting, matched eval, dumps, from-files)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from samplenet_tpu.models.pointnet_cls import PointNetClassifier
from samplenet_tpu.models.samplenet import SampleNet
from samplenet_tpu.train.evaluate import (
    evaluate_classifier_voting,
    evaluate_from_files,
    evaluate_samplenet_matched,
    infer_and_dump,
)
from samplenet_tpu.train.state import TrainState
from samplenet_tpu.utils.config import Configuration
from samplenet_tpu.utils.pointcloud import (
    apply_augmentations,
    complementary_points_idx,
    iterate_in_chunks,
    rand_rotation_matrix,
)


@pytest.fixture(scope="module")
def models():
    classifier = PointNetClassifier(num_classes=4)
    c_vars = classifier.init(jax.random.PRNGKey(0),
                             jnp.zeros((2, 16, 3)), training=False)
    sampler = SampleNet(num_out_points=16, bottleneck_size=32, group_size=4)
    s_vars = sampler.init(jax.random.PRNGKey(1),
                          jnp.zeros((2, 64, 3)), training=False)
    rng = np.random.RandomState(0)
    data = rng.randn(8, 64, 3).astype(np.float32)
    labels = rng.randint(0, 4, 8).astype(np.int32)
    return classifier, c_vars, sampler, s_vars, data, labels


class TestVotingEval:
    def test_runs_and_bounded(self, models):
        classifier, c_vars, _, _, data, labels = models
        report = evaluate_classifier_voting(
            classifier, c_vars, data[:, :16], labels, 4, num_votes=3)
        assert 0.0 <= report["accuracy"] <= 1.0
        assert report["per_class_accuracy"].shape == (4,)


class TestMatchedEval:
    def test_unique_nn_counts(self, models):
        classifier, c_vars, sampler, s_vars, data, labels = models
        report = evaluate_samplenet_matched(
            sampler, s_vars, classifier, c_vars, data, labels, 4)
        assert 1 <= report["mean_unique_nn"] <= 16
        assert 0.0 <= report["accuracy"] <= 1.0

    def test_batch_size_independent(self, models):
        """No test cloud is dropped or double-counted: with 8 samples, batch
        sizes 4 (divides), 3 (pad path) and 8 give identical reports."""
        classifier, c_vars, sampler, s_vars, data, labels = models
        reports = [
            evaluate_samplenet_matched(
                sampler, s_vars, classifier, c_vars, data, labels, bs)
            for bs in (4, 3, 8)
        ]
        for r in reports[1:]:
            assert r["accuracy"] == reports[0]["accuracy"]
            assert r["loss"] == pytest.approx(reports[0]["loss"], rel=1e-5)
            assert r["mean_unique_nn"] == pytest.approx(
                reports[0]["mean_unique_nn"], rel=1e-6)

    def test_emd_matching_mode(self, models):
        """--matching emd is a selectable eval matcher; outputs stay real
        input points (transport argmax indexes the full cloud)."""
        classifier, c_vars, sampler, s_vars, data, labels = models
        report = evaluate_samplenet_matched(
            sampler, s_vars, classifier, c_vars, data, labels, 4,
            matching="emd")
        assert 0.0 <= report["accuracy"] <= 1.0

    def test_voting_batch_size_independent(self, models):
        classifier, c_vars, _, _, data, labels = models
        r4 = evaluate_classifier_voting(
            classifier, c_vars, data[:, :16], labels, 4, num_votes=2)
        r3 = evaluate_classifier_voting(
            classifier, c_vars, data[:, :16], labels, 3, num_votes=2)
        assert r4["accuracy"] == r3["accuracy"]
        np.testing.assert_allclose(r4["per_class_accuracy"],
                                   r3["per_class_accuracy"])


class TestBaselineSamplers:
    def test_fps_and_random_run(self, models):
        from samplenet_tpu.train.evaluate import evaluate_baseline_sampler
        classifier, c_vars, _, _, data, labels = models
        for sampler in ("fps", "random"):
            r = evaluate_baseline_sampler(
                classifier, c_vars, data, labels, 3, 16, sampler=sampler)
            assert 0.0 <= r["accuracy"] <= 1.0, sampler


class TestDumpsAndFromFiles:
    def test_roundtrip(self, models, tmp_path):
        pytest.importorskip("h5py")
        classifier, c_vars, sampler, s_vars, data, labels = models
        state = TrainState.create(params=s_vars["params"],
                                  batch_stats=s_vars["batch_stats"],
                                  tx=optax.identity())
        paths = infer_and_dump(sampler, state, data, labels, str(tmp_path),
                               num_out_points=16, batch_size=4)
        assert set(paths) == {"simplified", "soft_projected",
                              "hard_projected", "sampled"}
        accs = evaluate_from_files(classifier, c_vars, paths["sampled"],
                                   [4, 8, 16], batch_size=4)
        assert set(accs) == {4, 8, 16}


class TestConfiguration:
    def test_save_load_roundtrip(self, tmp_path):
        c = Configuration(batch_size=50, loss="chamfer", alpha=0.01)
        c.extra = [1, 2, 3]
        c.save(str(tmp_path))
        c2 = Configuration.load(str(tmp_path))
        assert c2.batch_size == 50 and c2.loss == "chamfer"
        assert c2.extra == [1, 2, 3]
        assert c2.exists_and_is_not_none("alpha")
        assert not c2.exists_and_is_not_none("missing")


class TestPointcloudUtils:
    def test_rand_rotation_orthonormal(self):
        r = rand_rotation_matrix(np.random.RandomState(0))
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)

    def test_complementary_idx(self):
        comp = complementary_points_idx(6, [1, 3])
        np.testing.assert_array_equal(comp, [0, 2, 4, 5])

    def test_chunks(self):
        assert [list(c) for c in iterate_in_chunks(list(range(5)), 2)] == \
            [[0, 1], [2, 3], [4]]

    def test_apply_augmentations(self):
        batch = np.random.RandomState(1).randn(4, 16, 3).astype(np.float32)
        out = apply_augmentations(batch, z_rotate=True,
                                  gauss_augment={"sigma": 0.01},
                                  rng=np.random.RandomState(2))
        assert out.shape == batch.shape
        # z-rotation preserves the z coordinate up to the gaussian noise
        np.testing.assert_allclose(out[..., 2], batch[..., 2], atol=0.1)

    def test_plot_saves_png(self, tmp_path):
        pytest.importorskip("matplotlib")
        from samplenet_tpu.utils.pointcloud import plot_3d_point_cloud
        pts = np.random.RandomState(3).randn(50, 3)
        path = str(tmp_path / "cloud.png")
        plot_3d_point_cloud(pts, show=False, save_path=path)
        import os
        assert os.path.getsize(path) > 0


class TestServing:
    def test_batched_sampler_pads_and_slices(self):
        from samplenet_tpu.models import SampleNet
        from samplenet_tpu.serving import BatchedSampler
        net = SampleNet(num_out_points=8, bottleneck_size=32, group_size=4)
        rng = np.random.RandomState(0)
        x = rng.randn(4, 64, 3).astype(np.float32)
        v = net.init(jax.random.PRNGKey(0), jnp.asarray(x), training=False)
        sampler = BatchedSampler(net, v, max_batch=4, num_points=64)
        out3 = sampler(x[:3])          # padded path
        assert out3.shape == (3, 8, 3)
        out9 = sampler(np.concatenate([x, x, x[:1]]))  # multi-chunk path
        assert out9.shape == (9, 8, 3)
        # deterministic across padding: same cloud -> same sample
        np.testing.assert_allclose(out3[0], sampler(x[:1])[0], atol=1e-6)

    def test_microbatcher_coalesces_and_matches_direct(self):
        import concurrent.futures as cf

        from samplenet_tpu.models import SampleNet
        from samplenet_tpu.serving import BatchedSampler, MicroBatcher
        net = SampleNet(num_out_points=8, bottleneck_size=32, group_size=4)
        rng = np.random.RandomState(2)
        x = rng.randn(6, 64, 3).astype(np.float32)
        v = net.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]), training=False)
        sampler = BatchedSampler(net, v, max_batch=4, num_points=64)
        batcher = MicroBatcher(sampler, max_wait_ms=20.0)
        try:
            with cf.ThreadPoolExecutor(6) as pool:
                futs = list(pool.map(batcher.submit, list(x)))
            outs = np.stack([f.result(timeout=30) for f in futs])
        finally:
            batcher.close()
        direct = sampler(x)
        np.testing.assert_allclose(outs, direct, atol=1e-5)

    def test_versioned_artifact_roundtrip(self, tmp_path):
        from samplenet_tpu.models import SampleNet
        from samplenet_tpu import serving
        net = SampleNet(num_out_points=8, bottleneck_size=32, group_size=4)
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), x, training=False)
        path = str(tmp_path / "sampler.sntpu")
        serving.save_exported(path, net, v, batch=2, num_points=64,
                              metadata={"track": "classification"})
        fn, header = serving.load_exported(path)
        assert header["batch"] == 2 and header["num_points"] == 64
        assert header["track"] == "classification"
        out = fn(v, x)
        exp = net.apply(v, x, training=False)[1]
        np.testing.assert_allclose(np.asarray(out), np.asarray(exp), atol=1e-5)
        # corrupting the magic is rejected, future versions are rejected
        import pytest as _pytest
        bad = tmp_path / "bad.sntpu"
        bad.write_bytes(b"XXXXX" + open(path, "rb").read()[5:])
        with _pytest.raises(ValueError, match="not a samplenet-tpu"):
            serving.load_exported(str(bad))

    def test_frozen_artifact_sampler(self, tmp_path):
        """freeze_params artifact serves without model code or variables."""
        from samplenet_tpu.models import SampleNet
        from samplenet_tpu import serving
        net = SampleNet(num_out_points=8, bottleneck_size=32, group_size=4)
        rng = np.random.RandomState(5)
        x = rng.randn(2, 64, 3).astype(np.float32)
        v = net.init(jax.random.PRNGKey(0), jnp.asarray(x), training=False)
        path = str(tmp_path / "frozen.sntpu")
        serving.save_exported(path, net, v, batch=2, num_points=64,
                              freeze_params=True,
                              metadata={"num_out_points": 8})
        sampler = serving.ArtifactSampler(path)
        assert sampler.max_batch == 2 and sampler.num_points == 64
        out = sampler(x)
        exp = net.apply(v, jnp.asarray(x), training=False)[1]
        np.testing.assert_allclose(out, np.asarray(exp), atol=1e-5)
        # ragged + multi-chunk through the bounded pipeline window
        big = np.concatenate([x, x, x[:1]])
        assert sampler(big, window=2).shape == (5, 8, 3)
        # an unfrozen artifact is rejected with a pointed message
        import pytest as _pytest
        upath = str(tmp_path / "unfrozen.sntpu")
        serving.save_exported(upath, net, v, batch=2, num_points=64)
        with _pytest.raises(ValueError, match="freeze_params"):
            serving.ArtifactSampler(upath)

    def test_microbatcher_submit_after_close_raises(self):
        import pytest as _pytest

        from samplenet_tpu.models import SampleNet
        from samplenet_tpu.serving import BatchedSampler, MicroBatcher
        net = SampleNet(num_out_points=8, bottleneck_size=32, group_size=4)
        rng = np.random.RandomState(6)
        x = rng.randn(2, 64, 3).astype(np.float32)
        v = net.init(jax.random.PRNGKey(0), jnp.asarray(x), training=False)
        batcher = MicroBatcher(
            BatchedSampler(net, v, max_batch=2, num_points=64))
        batcher.close()
        with _pytest.raises(RuntimeError, match="close"):
            batcher.submit(x[0])

    def test_stablehlo_roundtrip(self):
        from samplenet_tpu.models import SampleNet
        from samplenet_tpu import serving
        net = SampleNet(num_out_points=8, bottleneck_size=32, group_size=4)
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        v = net.init(jax.random.PRNGKey(0), x, training=False)
        blob = serving.export_stablehlo(net, v, batch=2, num_points=64)
        assert len(blob) > 1000
        fn = serving.load_stablehlo(blob)
        out = fn(v, x)
        exp = net.apply(v, x, training=False)[1]
        np.testing.assert_allclose(np.asarray(out), np.asarray(exp), atol=1e-5)


class TestProfiling:
    def test_trace_writes_files(self, tmp_path):
        from samplenet_tpu.utils.profiling import StepTimer, trace
        import jax.numpy as jnp
        with trace(str(tmp_path)):
            x = jnp.ones((64, 64))
            (x @ x).block_until_ready()
        import os
        found = []
        for root, _, files in os.walk(str(tmp_path)):
            found.extend(files)
        assert found, "no trace files written"

    def test_step_timer(self):
        from samplenet_tpu.utils.profiling import StepTimer
        import jax.numpy as jnp
        t = StepTimer()
        for _ in range(3):
            dt = t.mark(jnp.ones(4))
            assert dt >= 0
        assert t.ema_ms is not None


class TestCanonicalParser:
    def test_defaults_match_reference(self):
        from samplenet_tpu.utils.args import get_parser
        args = get_parser().parse_args([])
        assert args.num_in_points == 1024
        assert args.num_out_points == 64
        assert args.bottleneck_size == 128
        assert args.alpha == 0.01 and args.lmbda == 0.01
        assert args.gamma == 1.0 and args.delta == 0.0
        assert args.group_size == 8

    def test_group_size_alias(self):
        from samplenet_tpu.utils.args import get_parser
        args = get_parser().parse_args(["--projection-group-size", "16"])
        assert args.group_size == 16
        args = get_parser().parse_args(["--group-size", "4"])
        assert args.group_size == 4


class TestStudyAggregators:
    def test_registration_seeds_table(self, tmp_path):
        import json

        from benchmarks.registration_seeds import main as agg

        for seed in (0, 1):
            pcr = tmp_path / f"seed{seed}" / "pcrnet"
            pcr.mkdir(parents=True)
            (pcr / "report.json").write_text(json.dumps({
                "full_iter1": {"rot_err_mean": 27.0 + seed, "auc": 0.85},
                "fps64_iter1": {"rot_err_mean": 29.0 + seed, "auc": 0.83},
                "fps16_iter1": {"rot_err_mean": 40.0 + seed, "auc": 0.70},
            }))
            sn = tmp_path / f"seed{seed}" / "samplenet64"
            sn.mkdir()
            (sn / "report.json").write_text(json.dumps({
                "best": {"rot_err_mean": 28.0 + seed, "auc": 0.84},
                "best_epoch": 5,
            }))
        out = agg(str(tmp_path))
        assert out["full"]["n_seeds"] == 2
        assert out["samplenet64"]["rot_mean"] == 28.5
        assert out["fps16"]["rot_mean"] == 40.5

    def test_softassign_study_table(self, tmp_path):
        import json

        from benchmarks.softassign_study import main as agg

        for c in ("sigma05", "outlier10"):
            for l in ("chamfer", "softassign"):
                d = tmp_path / f"{c}_{l}" / "sn"
                d.mkdir(parents=True)
                recs = [{"step": 1, "loss": 2.0},
                        {"step": 2, "nre": 1.5 if l == "chamfer" else 1.2}]
                (d / "metrics_samplenet.jsonl").write_text(
                    "\n".join(json.dumps(r) for r in recs))
        table = agg(str(tmp_path))
        assert table["sigma05"]["chamfer"] == 1.5
        assert table["outlier10"]["softassign"] == 1.2
        assert "emd" not in table["sigma05"]
