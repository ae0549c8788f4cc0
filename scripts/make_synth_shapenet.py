"""Generate a ShapeNetCore-SCHEMA synthetic dataset at official scale.

Rehearsal artifact for the reconstruction-track real-data standing item:
real ShapeNet bytes are egress-gated, so this writes a tree that is
byte-layout-identical to the official
`shape_net_core_uniform_samples_2048` drop — `<root>/<synsetId>/<modelId>.ply`
binary-little-endian PLYs of 2048 xyz f32 vertices, hex model ids — at the
official per-category scale (chair/03001627: 6,778 models), but with
PROCEDURAL geometry: each category maps to one data/procedural.py generator,
varied per model by a random anisotropic scale, an up-axis rotation, and
unit-sphere renormalisation, so a per-category autoencoder has real
intra-category structure to learn. Running the full
`--dataset shapenet --category chair` reconstruction pipeline against it
exercises every byte of the real-data path (synset lookup, file walk,
parallel PLY parse — native C++ parser when built — 85/5/10 split, AE +
SampleNet-AE training, NRE eval); only the geometry is stand-in.

    python scripts/make_synth_shapenet.py [--out data_synth] \
        [--category chair] [--count 6778] [--seed 0]

Reference layout: reconstruction/src/in_out.py:38-102 (synset map),
load_point_clouds (:220-243); official zip per BASELINE.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from samplenet_tpu.data.plyio import save_ply
from samplenet_tpu.data.procedural import _GENERATORS, make_cloud
from samplenet_tpu.data.shapenet import CATEGORY_TO_SYNSET

N_POINTS = 2048
# official model counts in shape_net_core_uniform_samples_2048 for the
# categories the reference's AE experiments use
OFFICIAL_COUNTS = {"chair": 6778, "table": 8509, "car": 7496,
                   "airplane": 4045}


def synth_model(category: str, rng: np.random.RandomState) -> np.ndarray:
    # stable across processes (builtin hash is salted)
    base = zlib.crc32(category.encode()) % len(_GENERATORS)
    pts = make_cloud(base, N_POINTS, rng)
    # intra-category variation: anisotropic scale + up-axis rotation
    scale = rng.uniform(0.7, 1.3, size=3).astype(np.float32)
    theta = rng.uniform(0, 2 * np.pi)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    pts = (pts * scale) @ rot.T
    # unit-sphere renormalisation (the official samples are normalised)
    pts = pts - pts.mean(axis=0, keepdims=True)
    pts = pts / np.max(np.linalg.norm(pts, axis=1))
    return pts.astype(np.float32)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data_synth")
    p.add_argument("--category", default="chair",
                   choices=sorted(CATEGORY_TO_SYNSET))
    p.add_argument("--count", type=int, default=None,
                   help="number of models (default: the official count "
                        "for the category, else 4096)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    synset = CATEGORY_TO_SYNSET[args.category]
    count = args.count or OFFICIAL_COUNTS.get(args.category, 4096)
    root = os.path.join(args.out, "shape_net_core_uniform_samples_2048",
                        synset)
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    for i in range(count):
        model_id = "".join(rng.choice(list("0123456789abcdef"), 32))
        save_ply(os.path.join(root, f"{model_id}.ply"),
                 synth_model(args.category, rng))
        if (i + 1) % 1000 == 0:
            print(f"{i + 1}/{count}", flush=True)
    print(f"wrote {count} {args.category} models under {root}")


if __name__ == "__main__":
    main()
