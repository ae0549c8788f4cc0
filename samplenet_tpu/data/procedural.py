"""Procedural shape dataset: a self-contained ModelNet-style benchmark.

The reference pipelines train on ModelNet40 HDF5 / ShapeNet PLY downloads
(classification/provider.py:10-19, reconstruction/src/in_out.py:23-36). This
environment has no network egress, so the framework ships a deterministic
procedural generator: K classes of parametric surfaces with per-sample
deformations (anisotropic scale, rotation about up, noise). Clouds are
unit-sphere normalised like ModelNet40's preprocessing, so models trained
here exercise exactly the same code paths and shapes as the real data.
"""

from __future__ import annotations

import numpy as np

CLASS_NAMES = (
    "sphere", "cube", "cylinder", "cone", "torus",
    "pyramid", "capsule", "disk", "helix", "cross",
)


def _unit_normalize(pts: np.ndarray) -> np.ndarray:
    pts = pts - pts.mean(0, keepdims=True)
    scale = np.max(np.linalg.norm(pts, axis=1))
    return pts / max(scale, 1e-8)


def _sphere(rng, n):
    v = rng.randn(n, 3)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _cube(rng, n):
    # points on the surface: pick a face, then uniform on it
    face = rng.randint(0, 6, n)
    uv = rng.uniform(-1, 1, (n, 2))
    pts = np.zeros((n, 3))
    axis = face % 3
    sign = np.where(face < 3, 1.0, -1.0)
    for i in range(n):
        others = [j for j in range(3) if j != axis[i]]
        pts[i, axis[i]] = sign[i]
        pts[i, others] = uv[i]
    return pts


def _cube_fast(rng, n):
    axis = rng.randint(0, 3, n)
    sign = rng.choice([-1.0, 1.0], n)
    uv = rng.uniform(-1, 1, (n, 2))
    pts = np.empty((n, 3))
    rows = np.arange(n)
    pts[rows, axis] = sign
    other = np.stack([(axis + 1) % 3, (axis + 2) % 3], 1)
    pts[rows[:, None], other] = uv
    return pts


def _cylinder(rng, n):
    theta = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-1, 1, n)
    return np.stack([np.cos(theta), z, np.sin(theta)], 1)


def _cone(rng, n):
    h = np.sqrt(rng.uniform(0, 1, n))  # area-uniform along height
    theta = rng.uniform(0, 2 * np.pi, n)
    r = 1.0 - h
    return np.stack([r * np.cos(theta), h * 2 - 1, r * np.sin(theta)], 1)


def _torus(rng, n, rr=0.35):
    u = rng.uniform(0, 2 * np.pi, n)
    v = rng.uniform(0, 2 * np.pi, n)
    x = (1 + rr * np.cos(v)) * np.cos(u)
    z = (1 + rr * np.cos(v)) * np.sin(u)
    y = rr * np.sin(v)
    return np.stack([x, y, z], 1)


def _pyramid(rng, n):
    # square base + 4 triangular faces
    base = rng.uniform(-1, 1, (n, 2))
    t = rng.uniform(0, 1, n)
    pick = rng.randint(0, 2, n)
    pts = np.empty((n, 3))
    apex = np.array([0.0, 1.5, 0.0])
    corners = np.array([[1, -1], [1, 1], [-1, 1], [-1, -1]], float)
    for i in range(n):
        if pick[i] == 0:
            pts[i] = [base[i, 0], -1.0, base[i, 1]]
        else:
            e = rng.randint(0, 4)
            a = np.array([corners[e][0], -1.0, corners[e][1]])
            b = np.array([corners[(e + 1) % 4][0], -1.0, corners[(e + 1) % 4][1]])
            u, v = rng.uniform(0, 1, 2)
            if u + v > 1:
                u, v = 1 - u, 1 - v
            pts[i] = a + u * (b - a) + v * (apex - a)
    return pts


def _capsule(rng, n):
    s = _sphere(rng, n)
    pts = s.copy()
    pts[:, 1] += np.sign(s[:, 1]) * 0.8
    return pts


def _disk(rng, n):
    r = np.sqrt(rng.uniform(0, 1, n))
    theta = rng.uniform(0, 2 * np.pi, n)
    y = rng.choice([-0.05, 0.05], n)
    return np.stack([r * np.cos(theta), y, r * np.sin(theta)], 1)


def _helix(rng, n):
    t = rng.uniform(0, 4 * np.pi, n)
    jitter = rng.randn(n, 3) * 0.05
    pts = np.stack([np.cos(t), t / (2 * np.pi) - 1, np.sin(t)], 1)
    return pts + jitter


def _cross(rng, n):
    # three orthogonal bars
    pick = rng.randint(0, 3, n)
    long_ = rng.uniform(-1, 1, n)
    short = rng.uniform(-0.2, 0.2, (n, 2))
    pts = np.empty((n, 3))
    rows = np.arange(n)
    pts[rows, pick] = long_
    other = np.stack([(pick + 1) % 3, (pick + 2) % 3], 1)
    pts[rows[:, None], other] = short
    return pts


_GENERATORS = (
    _sphere, _cube_fast, _cylinder, _cone, _torus,
    _pyramid, _capsule, _disk, _helix, _cross,
)


def make_cloud(label: int, num_points: int, rng: np.random.RandomState) -> np.ndarray:
    pts = _GENERATORS[label](rng, num_points)
    # per-sample deformation: anisotropic scale + up-axis rotation
    scale = rng.uniform(0.6, 1.4, size=(1, 3))
    pts = pts * scale
    ang = rng.uniform(0, 2 * np.pi)
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    pts = pts @ rot
    pts = pts + rng.randn(*pts.shape) * 0.01
    return _unit_normalize(pts).astype(np.float32)


def make_dataset(
    num_clouds: int,
    num_points: int = 1024,
    num_classes: int = len(_GENERATORS),
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (data [num_clouds, num_points, 3], labels [num_clouds])."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, num_classes, num_clouds).astype(np.int32)
    data = np.stack([make_cloud(int(l), num_points, rng) for l in labels])
    return data, labels
