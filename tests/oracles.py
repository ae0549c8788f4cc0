"""Numpy oracle implementations of the reference op semantics.

Independent ports of the CPU specs used only to validate the JAX ops:
  * nnsearch         — classification/structural_losses/tf_nndistance.cpp:21-43
  * approxmatch      — tf_approxmatch.cpp:23-84 (double precision)
  * matchcost        — tf_approxmatch.cpp:85-105
  * fps / seeded fps — registration/src/sputils.py:7-41
"""

import numpy as np


def nn_distance_np(xyz1, xyz2):
    d2 = ((xyz1[:, :, None, :] - xyz2[:, None, :, :]) ** 2).sum(-1)
    return d2.min(2), d2.argmin(2), d2.min(1), d2.argmin(1)


def knn_np(k, point_cloud, query_cloud):
    d2 = ((query_cloud[:, :, None, :] - point_cloud[:, None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=-1, kind="stable")[..., :k]
    dist = np.take_along_axis(d2, idx, axis=-1)
    return dist, idx


def approx_match_np(xyz1, xyz2):
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    factorl = max(n, m) // n
    factorr = max(n, m) // m
    match = np.zeros((b, n, m), dtype=np.float64)
    for i in range(b):
        satl = np.full(n, float(factorl))
        satr = np.full(m, float(factorr))
        d2 = ((xyz1[i, :, None, :] - xyz2[i, None, :, :]) ** 2).sum(-1)
        for j in range(8, -3, -1):
            level = 0.0 if j == -2 else -(4.0 ** j)
            weight = np.exp(np.float32(level * d2).astype(np.float64)) * satr[None, :]
            s = 1e-9 + weight.sum(1, keepdims=True)
            weight = weight / s * satl[:, None]
            ss = 1e-9 + weight.sum(0)
            r = np.minimum(satr / ss, 1.0)
            weight = weight * r[None, :]
            satl = np.maximum(satl - weight.sum(1), 0.0)
            satr = np.maximum(satr - weight.sum(0), 0.0)
            match[i] += weight
    return match


def match_cost_np(xyz1, xyz2, match):
    d = np.sqrt(((xyz1[:, :, None, :] - xyz2[:, None, :, :]) ** 2).sum(-1))
    return (match * d).sum((1, 2))


def _calc_distances(p0, points):
    return ((p0 - points) ** 2).sum(axis=1)


def fps_from_given_pc_np(pts, k, given_pc):
    farthest_pts = np.zeros((k, 3))
    t = np.size(given_pc) // 3
    farthest_pts[0:t] = given_pc
    distances = _calc_distances(farthest_pts[0], pts)
    for i in range(1, t):
        distances = np.minimum(distances, _calc_distances(farthest_pts[i], pts))
    for i in range(t, k):
        farthest_pts[i] = pts[np.argmax(distances)]
        distances = np.minimum(distances, _calc_distances(farthest_pts[i], pts))
    return farthest_pts


def unique_np(arr):
    _, idx = np.unique(arr, return_index=True)
    return arr[np.sort(idx)]


def nn_matching_np(full_pc, idx, k, complete_fps=True):
    batch_size = np.size(full_pc, 0)
    out_pc = np.zeros((full_pc.shape[0], k, 3))
    for ii in range(0, batch_size):
        best_idx = idx[ii]
        if complete_fps:
            best_idx = unique_np(best_idx)
            out_pc[ii] = fps_from_given_pc_np(full_pc[ii], k, full_pc[ii][best_idx])
        else:
            out_pc[ii] = full_pc[ii][best_idx]
    return out_pc[:, 0:k, :]


def fps_np(npoint, pts, start=0):
    n = pts.shape[0]
    sel = [start]
    dist = _calc_distances(pts[start], pts)
    for _ in range(1, npoint):
        nxt = int(np.argmax(dist))
        sel.append(nxt)
        dist = np.minimum(dist, _calc_distances(pts[nxt], pts))
    return np.array(sel)
