"""Native C++ loader tests (skipped when the toolchain can't build it)."""

import numpy as np
import pytest

from samplenet_tpu.data.plyio import save_ply

runtime = pytest.importorskip("samplenet_tpu.runtime")

if not runtime.native_available():  # pragma: no cover
    pytest.skip("libsnloader.so not buildable", allow_module_level=True)


class TestNativePly:
    @pytest.mark.parametrize("binary", [True, False])
    def test_parity_with_python_reader(self, tmp_path, binary):
        pts = np.random.RandomState(0).randn(200, 3).astype(np.float32)
        path = str(tmp_path / "t.ply")
        save_ply(path, pts, binary=binary)
        got = runtime.load_ply_native(path)
        np.testing.assert_allclose(got, pts, atol=1e-4)


class TestNativePipeline:
    def test_epoch_complete_and_labels_aligned(self):
        rng = np.random.RandomState(1)
        data = rng.randn(40, 64, 3).astype(np.float32)
        labels = (np.arange(40) % 7).astype(np.int32)
        with runtime.NativeLoader(data, labels, 8, augment=False,
                                  seed=3) as it:
            batches = list(it)
        assert len(batches) == 5
        # unaugmented clouds must be source clouds with matching labels
        lookup = {data[i].tobytes(): labels[i] for i in range(40)}
        for points, labs in batches:
            for cloud, lab in zip(points, labs):
                assert lookup[cloud.tobytes()] == lab

    def test_augment_preserves_y_and_norm(self):
        rng = np.random.RandomState(2)
        data = rng.randn(16, 32, 3).astype(np.float32)
        with runtime.NativeLoader(data, None, 16, augment=True, seed=0) as it:
            (points, _), = list(it)
        # jitter is clipped at 0.05; rotation preserves y up to jitter
        assert np.isfinite(points).all()
        assert points.shape == (16, 32, 3)

    def test_reshuffles_by_seed(self):
        data = np.random.RandomState(3).randn(32, 16, 3).astype(np.float32)
        def order(seed):
            with runtime.NativeLoader(data, None, 32, augment=False,
                                      seed=seed) as it:
                (points, _), = list(it)
            return points.tobytes()
        assert order(0) != order(1)
        assert order(0) == order(0)


class TestNativePlyMultiElement:
    def test_vertex_count_not_clobbered_by_face_element(self, tmp_path):
        """Regression: 'element face M' after 'element vertex N' must not
        overwrite the vertex count."""
        pts = np.random.RandomState(0).randn(10, 3).astype(np.float32)
        path = str(tmp_path / "vf.ply")
        header = ("ply\nformat binary_little_endian 1.0\n"
                  "element vertex 10\n"
                  "property float x\nproperty float y\nproperty float z\n"
                  "element face 25\n"
                  "property uchar pad\n"
                  "end_header\n")
        with open(path, "wb") as f:
            f.write(header.encode())
            f.write(pts.astype("<f4").tobytes())
            f.write(b"\x00" * 25)
        got = runtime.load_ply_native(path)
        assert got.shape == (10, 3)
        np.testing.assert_allclose(got, pts, atol=1e-6)
