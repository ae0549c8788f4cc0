"""ShapeNetCore point-cloud dataset layer (reconstruction track).

Parity with reconstruction/src/in_out.py: synset-id <-> category name map
(:38-102), parallel PLY loading (:220-243; thread pool instead of the
reference's process pool — loading is IO/numpy-bound), the 85/5/10
train/val/test split (:188-217), and an epoch-batching dataset wrapper
(PointCloudDataSet, :278-404). Downloads are gated like modelnet.py.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from samplenet_tpu.data.plyio import load_ply

# ShapeNetCore synsetId -> human category (in_out.py:38-102)
SYNSET_TO_CATEGORY = {
    "02691156": "airplane", "02773838": "bag", "02801938": "basket",
    "02808440": "bathtub", "02818832": "bed", "02828884": "bench",
    "02834778": "bicycle", "02843684": "birdhouse", "02871439": "bookshelf",
    "02876657": "bottle", "02880940": "bowl", "02924116": "bus",
    "02933112": "cabinet", "02747177": "can", "02942699": "camera",
    "02954340": "cap", "02958343": "car", "03001627": "chair",
    "03046257": "clock", "03207941": "dishwasher", "03211117": "monitor",
    "04379243": "table", "04401088": "telephone", "02946921": "tin_can",
    "04460130": "tower", "04468005": "train", "03085013": "keyboard",
    "03261776": "earphone", "03325088": "faucet", "03337140": "file",
    "03467517": "guitar", "03513137": "helmet", "03593526": "jar",
    "03624134": "knife", "03636649": "lamp", "03642806": "laptop",
    "03691459": "speaker", "03710193": "mailbox", "03759954": "microphone",
    "03761084": "microwave", "03790512": "motorcycle", "03797390": "mug",
    "03928116": "piano", "03938244": "pillow", "03948459": "pistol",
    "03991062": "pot", "04004475": "printer", "04074963": "remote_control",
    "04090263": "rifle", "04099429": "rocket", "04225987": "skateboard",
    "04256520": "sofa", "04330267": "stove", "04530566": "vessel",
    "04554684": "washer", "02858304": "boat", "02992529": "cellphone",
}
CATEGORY_TO_SYNSET = {v: k for k, v in SYNSET_TO_CATEGORY.items()}

DATA_URL = "http://www.cs.toronto.edu/~rjliao/data/shape_net_core_uniform_samples_2048.zip"


def ensure_dataset(data_dir: str) -> str:
    root = os.path.join(data_dir, "shape_net_core_uniform_samples_2048")
    if os.path.isdir(root):
        return root
    raise FileNotFoundError(
        f"ShapeNetCore samples not found at {root}. No network egress here; "
        f"download {DATA_URL} elsewhere, unpack, or use the procedural dataset."
    )


def files_in_subdirs(top_dir: str, suffix: str = ".ply") -> list[str]:
    out = []
    for root, _, files in os.walk(top_dir):
        for fn in sorted(files):
            if fn.endswith(suffix):
                out.append(os.path.join(root, fn))
    return out


def load_point_clouds(
    file_names: list[str], num_points: int | None = None, threads: int = 8
) -> np.ndarray:
    """Parallel PLY load -> [M, N, 3] (in_out.py load_point_clouds).

    Prefers the native C++ parser (runtime/native/loader.cpp) when built —
    ctypes releases the GIL during the call, so the thread pool parses
    genuinely in parallel; falls back per-process to the pure-python
    plyio reader."""
    from samplenet_tpu.runtime import load_ply_native, native_available

    native = native_available()

    def one(fn):
        pts = load_ply_native(fn) if native else load_ply(fn)[:, :3]
        return pts[:num_points] if num_points else pts

    with ThreadPoolExecutor(max_workers=threads) as pool:
        clouds = list(pool.map(one, file_names))
    return np.stack(clouds).astype(np.float32)


def train_val_test_split(
    items: np.ndarray | list,
    train_p: float = 0.85,
    val_p: float = 0.05,
    seed: int | None = None,
):
    """85/5/10 split (in_out.py:188-217 semantics)."""
    n = len(items)
    order = np.arange(n)
    if seed is not None:
        np.random.RandomState(seed).shuffle(order)
    n_train = int(round(train_p * n))
    n_val = int(round(val_p * n))
    idx = {
        "train": order[:n_train],
        "val": order[n_train : n_train + n_val],
        "test": order[n_train + n_val :],
    }
    if isinstance(items, np.ndarray):
        return items[idx["train"]], items[idx["val"]], items[idx["test"]]
    arr = np.asarray(items, dtype=object)
    return (list(arr[idx["train"]]), list(arr[idx["val"]]), list(arr[idx["test"]]))


class PointCloudDataSet:
    """Shuffling epoch iterator with the reference's wrap-around next_batch
    contract (in_out.py:278-404)."""

    def __init__(self, point_clouds: np.ndarray, *, labels=None,
                 copy: bool = True, init_shuffle: bool = True, seed: int = 0):
        self.point_clouds = np.array(point_clouds, copy=copy)
        self.num_examples = len(self.point_clouds)
        self.labels = (np.asarray(labels) if labels is not None
                       else np.ones((self.num_examples, 1)))
        self.epochs_completed = 0
        self._index_in_epoch = 0
        self._rng = np.random.RandomState(seed)
        if init_shuffle:
            self.shuffle_data()

    def shuffle_data(self):
        perm = self._rng.permutation(self.num_examples)
        self.point_clouds = self.point_clouds[perm]
        self.labels = self.labels[perm]
        return self

    def next_batch(self, batch_size: int):
        start = self._index_in_epoch
        self._index_in_epoch += batch_size
        if self._index_in_epoch > self.num_examples:
            self.epochs_completed += 1
            self.shuffle_data()
            start = 0
            self._index_in_epoch = batch_size
            assert batch_size <= self.num_examples
        end = self._index_in_epoch
        return self.point_clouds[start:end], self.labels[start:end]

    def full_epoch_data(self):
        return self.point_clouds, self.labels

    def merge(self, other: "PointCloudDataSet") -> "PointCloudDataSet":
        self.point_clouds = np.concatenate([self.point_clouds, other.point_clouds])
        self.labels = np.concatenate([self.labels, other.labels])
        self.num_examples = len(self.point_clouds)
        self.shuffle_data()
        return self


def load_category_split(
    data_dir: str, category: str, num_points: int = 2048, seed: int | None = None
):
    """Load one category's PLYs and split 85/5/10 (train_ae.py:57-89 flow)."""
    root = ensure_dataset(data_dir)
    synset = CATEGORY_TO_SYNSET.get(category, category)
    files = files_in_subdirs(os.path.join(root, synset))
    tr, va, te = train_val_test_split(files, seed=seed)
    return (load_point_clouds(tr, num_points),
            load_point_clouds(va, num_points) if va else np.zeros((0, num_points, 3), np.float32),
            load_point_clouds(te, num_points) if te else np.zeros((0, num_points, 3), np.float32))
