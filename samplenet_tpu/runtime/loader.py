"""ctypes bindings for the native C++ data-loading runtime.

`NativeLoader` wraps the threaded prefetch pipeline in libsnloader.so:
workers shuffle, augment (rotate-about-up + clipped jitter), and batch clouds
off the GIL while the TPU runs the previous step. Falls back cleanly when the
library hasn't been built (`make -C samplenet_tpu/runtime/native`); the
python `iterate_batches` path stays the source of truth for semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsnloader.so")
_lib = None


def _load_lib(build: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sn_load_ply.restype = ctypes.c_int64
    lib.sn_load_ply.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.sn_pipeline_create.restype = ctypes.c_void_p
    lib.sn_pipeline_create.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint64, ctypes.c_int]
    lib.sn_pipeline_epoch_batches.restype = ctypes.c_int64
    lib.sn_pipeline_epoch_batches.argtypes = [ctypes.c_void_p]
    lib.sn_pipeline_next.restype = ctypes.c_int
    lib.sn_pipeline_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32)]
    lib.sn_pipeline_destroy.restype = None
    lib.sn_pipeline_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def load_ply_native(path: str) -> np.ndarray:
    """Parse a PLY via C++; returns [N, 3] float32 xyz."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native loader not built")
    count = lib.sn_load_ply(path.encode(), None, 0)
    if count <= 0:
        raise ValueError(f"failed to parse {path}")
    out = np.empty((count, 3), np.float32)
    got = lib.sn_load_ply(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size)
    if got != count:
        raise ValueError(f"short read parsing {path}")
    return out


class NativeLoader:
    """One-epoch prefetching batch iterator over an in-memory dataset.

    Usage:
        with NativeLoader(data, labels, 32, augment=True, seed=e) as it:
            for points, labels in it: ...
    A fresh instance per epoch reshuffles with the given seed.
    """

    def __init__(self, data: np.ndarray, labels: np.ndarray | None,
                 batch_size: int, *, augment: bool = False, seed: int = 0,
                 num_workers: int = 2):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "native loader not built; run make -C samplenet_tpu/runtime/native")
        self._lib = lib
        self._data = np.ascontiguousarray(data, np.float32)
        self._labels = (np.ascontiguousarray(labels, np.int32)
                        if labels is not None else None)
        self.batch_size = batch_size
        self.num_points = self._data.shape[1]
        self._handle = lib.sn_pipeline_create(
            self._data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            (self._labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
             if self._labels is not None else None),
            len(self._data), self.num_points, batch_size, int(augment),
            seed, num_workers)
        self.epoch_batches = lib.sn_pipeline_epoch_batches(self._handle)

    def __iter__(self):
        points = np.empty((self.batch_size, self.num_points, 3), np.float32)
        labels = np.empty((self.batch_size,), np.int32)
        while True:
            ok = self._lib.sn_pipeline_next(
                self._handle,
                points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if not ok:
                return
            yield points.copy(), labels.copy()

    def close(self):
        if self._handle:
            self._lib.sn_pipeline_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
