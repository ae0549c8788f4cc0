"""Data layer tests: PLY IO, ShapeNet utilities, transforms, augmentations,
procedural dataset, h5 round-trip."""

import os

import jax
import numpy as np
import pytest

from samplenet_tpu.data import augment, iterate_batches, make_dataset
from samplenet_tpu.data.modelnet import load_h5, save_h5
from samplenet_tpu.data.pctransforms import (
    Compose,
    OnUnitCube,
    PointcloudJitter,
    PointcloudRandomInputDropout,
    PointcloudRotate,
    PointcloudScale,
    angle_axis_matrix,
)
from samplenet_tpu.data.plyio import load_ply, save_ply
from samplenet_tpu.data.shapenet import (
    PointCloudDataSet,
    SYNSET_TO_CATEGORY,
    train_val_test_split,
)


class TestPlyIO:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, tmp_path, binary):
        pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
        path = str(tmp_path / "test.ply")
        save_ply(path, pts, binary=binary)
        loaded = load_ply(path)
        np.testing.assert_allclose(loaded[:, :3], pts, atol=1e-5)


class TestH5:
    def test_roundtrip(self, tmp_path):
        pytest.importorskip("h5py")
        data = np.random.RandomState(1).randn(10, 64, 3).astype(np.float32)
        labels = np.arange(10, dtype=np.uint8)
        path = str(tmp_path / "test.h5")
        save_h5(path, data, labels)
        d, l = load_h5(path)
        np.testing.assert_allclose(d, data, atol=1e-6)
        np.testing.assert_array_equal(l, labels)


class TestShapeNetUtils:
    def test_split_proportions(self):
        items = np.arange(100)
        tr, va, te = train_val_test_split(items, seed=0)
        assert len(tr) == 85 and len(va) == 5 and len(te) == 10
        assert len(set(tr) | set(va) | set(te)) == 100

    def test_synset_map(self):
        assert SYNSET_TO_CATEGORY["02958343"] == "car"
        assert SYNSET_TO_CATEGORY["03001627"] == "chair"

    def test_pointcloud_dataset_next_batch(self):
        data = np.random.RandomState(2).randn(10, 8, 3).astype(np.float32)
        ds = PointCloudDataSet(data, init_shuffle=False)
        seen = 0
        for _ in range(5):
            batch, _ = ds.next_batch(4)
            assert batch.shape == (4, 8, 3)
            seen += 4
        assert ds.epochs_completed >= 1


class TestTransforms:
    def test_angle_axis_orthonormal(self):
        r = angle_axis_matrix(0.7, np.array([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-6)

    def test_on_unit_cube(self):
        pts = np.random.RandomState(3).randn(50, 3).astype(np.float32) * 5
        out = OnUnitCube()(pts)
        extent = out.max(0) - out.min(0)
        assert extent.max() == pytest.approx(1.0, abs=1e-5)
        np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-6)

    def test_dropout_keeps_shape(self):
        pts = np.random.RandomState(4).randn(64, 3).astype(np.float32)
        out = PointcloudRandomInputDropout()(pts, np.random.RandomState(0))
        assert out.shape == pts.shape

    def test_compose(self):
        pts = np.random.RandomState(5).randn(32, 3).astype(np.float32)
        pipeline = Compose(PointcloudScale(), PointcloudRotate(),
                           PointcloudJitter())
        out = pipeline(pts, np.random.RandomState(1))
        assert out.shape == pts.shape


class TestAugment:
    def test_rotation_preserves_y_and_norm(self):
        batch = np.random.RandomState(6).randn(4, 32, 3).astype(np.float32)
        out = augment.rotate_point_cloud(batch, np.random.RandomState(0))
        np.testing.assert_allclose(out[..., 1], batch[..., 1], atol=1e-5)
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), np.linalg.norm(batch, axis=-1),
            atol=1e-4)

    def test_jax_numpy_rotation_equivalence(self):
        """jax and numpy paths implement the same Y-rotation convention."""
        batch = np.random.RandomState(7).randn(2, 16, 3).astype(np.float32)
        ang = 0.83
        np_out = augment.rotate_point_cloud_by_angle(batch, ang)
        # jax path with a forced angle: build rot manually via the jax code
        import jax.numpy as jnp
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        np.testing.assert_allclose(np_out, batch @ rot, atol=1e-5)

    def test_jitter_clip(self):
        batch = np.zeros((2, 100, 3), np.float32)
        out = augment.jitter_point_cloud(batch, np.random.RandomState(0),
                                         sigma=1.0, clip=0.05)
        assert np.abs(out).max() <= 0.05 + 1e-6

    def test_augment_for_classification_jittable(self):
        import jax.numpy as jnp
        batch = jnp.zeros((2, 16, 3), jnp.float32)
        out = jax.jit(augment.augment_for_classification)(
            jax.random.PRNGKey(0), batch)
        assert out.shape == (2, 16, 3)


class TestProcedural:
    def test_deterministic(self):
        d1, l1 = make_dataset(16, 128, seed=3)
        d2, l2 = make_dataset(16, 128, seed=3)
        np.testing.assert_allclose(d1, d2)
        np.testing.assert_array_equal(l1, l2)

    def test_normalized(self):
        d, _ = make_dataset(8, 128, seed=4)
        norms = np.linalg.norm(d, axis=-1).max(1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_classes_distinguishable(self):
        """Same-class clouds are closer (chamfer) than cross-class on average."""
        from samplenet_tpu.ops import chamfer_loss
        import jax.numpy as jnp
        rng = np.random.RandomState(0)
        from samplenet_tpu.data.procedural import CLASS_NAMES, make_cloud
        sphere = CLASS_NAMES.index("sphere")
        helix = CLASS_NAMES.index("helix")
        a1 = make_cloud(sphere, 256, rng)
        a2 = make_cloud(sphere, 256, rng)
        b1 = make_cloud(helix, 256, rng)
        same = float(chamfer_loss(jnp.asarray(a1[None]), jnp.asarray(a2[None])))
        cross = float(chamfer_loss(jnp.asarray(a1[None]), jnp.asarray(b1[None])))
        assert same < cross

    def test_iterate_batches_drop_last(self):
        d, l = make_dataset(10, 16, seed=5)
        batches = list(iterate_batches(d, l, 4, shuffle=False))
        assert len(batches) == 2


class TestModelNetSplitPaths:
    def test_load_split_resolves_list_entries(self, tmp_path):
        """Regression: file-list entries like 'data/<root>/x.h5' must resolve
        inside the dataset root, not beside it."""
        pytest.importorskip("h5py")
        from samplenet_tpu.data.modelnet import load_split, save_h5
        root = tmp_path / "modelnet40_ply_hdf5_2048"
        root.mkdir()
        data = np.random.RandomState(0).randn(4, 16, 3).astype(np.float32)
        save_h5(str(root / "ply_data_train0.h5"), data,
                np.arange(4, dtype=np.uint8))
        (root / "train_files.txt").write_text(
            "data/modelnet40_ply_hdf5_2048/ply_data_train0.h5\n")
        d, l = load_split(str(tmp_path), "train")
        assert d.shape == (4, 16, 3)
        np.testing.assert_array_equal(l, np.arange(4))
