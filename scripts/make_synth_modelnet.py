"""Generate a ModelNet40-SCHEMA synthetic dataset at official scale.

Rehearsal artifact for the real-data standing item (VERDICT #8 / BASELINE
primary metric): real ModelNet40 bytes are egress-gated, so this writes a
dataset that is byte-layout-identical to the official
`modelnet40_ply_hdf5_2048` drop — same directory name, `train_files.txt` /
`test_files.txt` in the official "data/modelnet40_ply_hdf5_2048/ply_data_
train0.h5" entry style, gzip h5 shards of 2048 clouds with `data`
[N, 2048, 3] f32 and `label` [N, 1] uint8 — at the official scale
(9,840 train / 2,468 test, 40 classes), but with PROCEDURAL geometry
(data/procedural.py's 24 generators; classes 24-39 reuse generators 0-15
under a fixed anisotropic pre-scale so all 40 classes are genuinely
separable). Running the full `--dataset modelnet40` pipeline against it
exercises every byte of the real-data path (load_split, shard concat,
2048->num_points slice, 40-class heads, voting eval) at paper scale; only
the geometry is stand-in.

    python scripts/make_synth_modelnet.py [--out data_synth] [--seed 0]

Reference layout: classification/provider.py + data_prep_util.save_h5.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from samplenet_tpu.data.modelnet import save_h5
from samplenet_tpu.data.procedural import _GENERATORS, make_cloud

N_TRAIN, N_TEST, N_POINTS, N_CLASSES = 9840, 2468, 2048, 40
SHARD = 2048
# classes >= 24 map onto generators 0..15 with a tall-thin pre-scale —
# a systematic, learnable distinction from their base class
VARIANT_SCALE = np.array([0.55, 1.8, 0.55], np.float32)


def synth_cloud(label: int, rng: np.random.RandomState) -> np.ndarray:
    base = label % len(_GENERATORS)
    pts = make_cloud(base, N_POINTS, rng)
    if label >= len(_GENERATORS):
        pts = pts * VARIANT_SCALE
        n = np.abs(pts).max()
        pts = (pts / n).astype(np.float32)
    return pts


def write_split(root: str, split: str, count: int, seed: int) -> None:
    rng = np.random.RandomState(seed)
    labels = rng.permutation(np.arange(count) % N_CLASSES).astype(np.uint8)
    entries = []
    for si, s in enumerate(range(0, count, SHARD)):
        ls = labels[s : s + SHARD]
        data = np.stack([synth_cloud(int(l), rng) for l in ls])
        fn = f"ply_data_{split}{si}.h5"
        save_h5(os.path.join(root, fn), data, ls[:, None])
        entries.append(f"data/modelnet40_ply_hdf5_2048/{fn}")
        print(f"{split} shard {si}: {len(ls)} clouds", flush=True)
    with open(os.path.join(root, f"{split}_files.txt"), "w") as f:
        f.write("\n".join(entries) + "\n")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data_synth")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    root = os.path.join(args.out, "modelnet40_ply_hdf5_2048")
    os.makedirs(root, exist_ok=True)
    write_split(root, "train", N_TRAIN, args.seed)
    write_split(root, "test", N_TEST, args.seed + 1)
    with open(os.path.join(root, "shape_names.txt"), "w") as f:
        f.write("\n".join(f"synth_{i:02d}" for i in range(N_CLASSES)) + "\n")
    print(f"wrote {N_TRAIN}+{N_TEST} clouds under {root}")


if __name__ == "__main__":
    main()
