"""Build a single-class registration dataset from ModelNet40
(registration/data/create_dataset_torch.py flow: filter by category, write
train/test h5 shards + an index json).

    python scripts/make_car_dataset.py --data-dir data --category car
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from samplenet_tpu.data.modelnet import (
    MODELNET40_CLASSES,
    load_split,
    save_h5,
)


def main(argv=None):
    p = argparse.ArgumentParser("make_car_dataset")
    p.add_argument("--data-dir", default="data")
    p.add_argument("--category", default="car", choices=MODELNET40_CLASSES)
    p.add_argument("--out-dir", default=None)
    args = p.parse_args(argv)

    label = MODELNET40_CLASSES.index(args.category)
    out_dir = args.out_dir or os.path.join(args.data_dir, args.category)
    os.makedirs(out_dir, exist_ok=True)

    index = {}
    for split in ("train", "test"):
        data, labels = load_split(args.data_dir, split)
        mask = labels == label
        subset = data[mask]
        path = os.path.join(out_dir, f"{args.category}_{split}.h5")
        save_h5(path, subset, np.full(len(subset), label, np.uint8))
        index[split] = {"count": int(mask.sum()), "file": path}
        print(f"{split}: {mask.sum()} {args.category} clouds -> {path}")

    with open(os.path.join(out_dir, "index.json"), "w") as f:
        json.dump(index, f, indent=1)


if __name__ == "__main__":
    main()
