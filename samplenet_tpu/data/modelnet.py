"""ModelNet40 HDF5 dataset IO + batch iteration.

Parity with classification/provider.py (h5 load, file lists, download gate)
and classification/utils/data_prep_util.py (h5 save). The official dataset is
`modelnet40_ply_hdf5_2048` — 2048-point clouds, 40 classes, official
train/test split listed in {train,test}_files.txt.

Downloads are gated: this environment has no egress, so `ensure_dataset`
raises with instructions instead of fetching. Everything downstream accepts a
plain (data, labels) pair, so the procedural dataset (procedural.py) is a
drop-in substitute.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

DATA_URL = (
    "https://shapenet.cs.stanford.edu/media/modelnet40_ply_hdf5_2048.zip"
)

MODELNET40_CLASSES = (
    "airplane", "bathtub", "bed", "bench", "bookshelf", "bottle", "bowl",
    "car", "chair", "cone", "cup", "curtain", "desk", "door", "dresser",
    "flower_pot", "glass_box", "guitar", "keyboard", "lamp", "laptop",
    "mantel", "monitor", "night_stand", "person", "piano", "plant", "radio",
    "range_hood", "sink", "sofa", "stairs", "stool", "table", "tent",
    "toilet", "tv_stand", "vase", "wardrobe", "xbox",
)


def ensure_dataset(data_dir: str) -> str:
    root = os.path.join(data_dir, "modelnet40_ply_hdf5_2048")
    if os.path.isdir(root):
        return root
    raise FileNotFoundError(
        f"ModelNet40 not found at {root}. This environment has no network "
        f"egress; download {DATA_URL} elsewhere and unpack it there, or use "
        f"dataset='procedural'."
    )


def get_data_files(list_path: str) -> list[str]:
    with open(list_path) as f:
        return [line.strip() for line in f if line.strip()]


def load_h5(path: str) -> tuple[np.ndarray, np.ndarray]:
    if h5py is None:
        raise ImportError("h5py is required for ModelNet40 loading")
    with h5py.File(path, "r") as f:
        data = f["data"][:]
        label = f["label"][:]
    return data.astype(np.float32), label.squeeze().astype(np.int32)


def save_h5(
    path: str,
    data: np.ndarray,
    label: np.ndarray | None = None,
    data_dtype: str = "float32",
    label_dtype: str = "uint8",
) -> None:
    """h5 dump (data_prep_util.save_h5 semantics, gzip-compressed)."""
    if h5py is None:
        raise ImportError("h5py is required for h5 export")
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data, compression="gzip",
                         compression_opts=4, dtype=data_dtype)
        if label is not None:
            f.create_dataset("label", data=label, compression="gzip",
                             compression_opts=1, dtype=label_dtype)


def load_split(data_dir: str, split: str) -> tuple[np.ndarray, np.ndarray]:
    """Loads + concatenates all h5 shards of the official split."""
    root = ensure_dataset(data_dir)
    files = get_data_files(os.path.join(root, f"{split}_files.txt"))
    datas, labels = [], []
    for fn in files:
        # list entries look like "data/modelnet40_ply_hdf5_2048/ply_data_*.h5";
        # resolve the basename against the dataset root itself
        path = fn if os.path.isabs(fn) else os.path.join(
            root, os.path.basename(fn))
        d, l = load_h5(path)
        datas.append(d)
        labels.append(l)
    return np.concatenate(datas), np.concatenate(labels)


def iterate_batches(
    data: np.ndarray,
    labels: np.ndarray,
    batch_size: int,
    *,
    shuffle: bool = True,
    drop_last: bool = True,
    rng: np.random.RandomState | None = None,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Epoch iterator; shuffles cloud order (provider.shuffle_data)."""
    n = len(labels)
    order = np.arange(n)
    if shuffle:
        (rng or np.random).shuffle(order)
    end = n - (n % batch_size) if drop_last else n
    for s in range(0, end, batch_size):
        idx = order[s : s + batch_size]
        yield data[idx], labels[idx]


def iterate_batches_padded(
    data: np.ndarray, labels: np.ndarray, batch_size: int
) -> Iterator[tuple[np.ndarray, np.ndarray, int]]:
    """Full-coverage eval iterator: yields (batch, labels, real_count).

    The final partial batch is padded by repeating its last element so every
    jit call sees the same static shape (the reference evaluates every test
    sample, registration/main.py:127); callers must slice per-sample outputs
    to [:real_count]. Order is preserved, nothing is shuffled or dropped.
    """
    n = len(labels)
    for s in range(0, n, batch_size):
        bx, by = data[s : s + batch_size], labels[s : s + batch_size]
        real = len(by)
        if real < batch_size:
            pad = batch_size - real
            bx = np.concatenate([bx, np.repeat(bx[-1:], pad, axis=0)])
            by = np.concatenate([by, np.repeat(by[-1:], pad, axis=0)])
        yield bx, by, real
