"""Evaluation protocols and inference dumps for the classification track.

Parity surfaces:
  * rotation-voting classifier eval (classification/evaluate_classifier.py:
    150-199 — logits summed over num_votes up-axis rotations);
  * SampleNet eval with matched output + unique-NN-index statistics
    (evaluate_samplenet.py:215-282);
  * ordered inference dumps to h5 trees simplified/soft_projected/
    hard_projected/sampled (infer_samplenet_progressive.py:94-255);
  * prefix-size evaluation straight from dump files
    (evaluate_from_files.py:109-191).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from samplenet_tpu.data import augment, iterate_batches_padded
from samplenet_tpu.data.modelnet import load_h5, save_h5
from samplenet_tpu.models.pointnet_cls import PointNetClassifier, classification_loss
from samplenet_tpu.models.samplenet import SampleNet
from samplenet_tpu.ops.matching import emd_matching, first_occurrence_mask
from samplenet_tpu.ops.pairwise import chunked_min_argmin
from samplenet_tpu.train.progressive import make_progressive_infer_step


def evaluate_classifier_voting(
    classifier: PointNetClassifier, c_vars: dict,
    data: np.ndarray, labels: np.ndarray,
    batch_size: int, num_votes: int = 12,
) -> dict:
    """Sum logits over rotated copies; argmax decides (evaluate_classifier)."""

    @jax.jit
    def logits_fn(points):
        out, _ = classifier.apply(c_vars, points, training=False)
        return out

    num_classes = None
    correct, per_class_seen, per_class_ok = 0, None, None
    total = 0
    for bx, by, real in iterate_batches_padded(data, labels, batch_size):
        vote_sum = None
        for vote in range(num_votes):
            rotated = augment.rotate_point_cloud_by_angle(
                bx, vote / num_votes * 2 * np.pi)
            lg = np.asarray(logits_fn(jnp.asarray(rotated)))
            vote_sum = lg if vote_sum is None else vote_sum + lg
        pred = vote_sum.argmax(1)[:real]
        by = by[:real]
        if num_classes is None:
            num_classes = vote_sum.shape[1]
            per_class_seen = np.zeros(num_classes)
            per_class_ok = np.zeros(num_classes)
        correct += int((pred == by).sum())
        total += len(by)
        for label, p in zip(by, pred):
            per_class_seen[label] += 1
            per_class_ok[label] += float(p == label)
    return {
        "accuracy": correct / max(total, 1),
        "per_class_accuracy": per_class_ok / np.maximum(per_class_seen, 1),
    }


def evaluate_samplenet_matched(
    sampler: SampleNet, s_vars: dict,
    classifier: PointNetClassifier, c_vars: dict,
    data: np.ndarray, labels: np.ndarray, batch_size: int,
    *, match_output: bool = True, matching: str = "nn",
) -> dict:
    """Eval with matched (or raw simplified) output; also reports the mean
    number of unique NN indices per cloud (evaluate_samplenet.py:227-228).

    matching="nn" is the standard unique+FPS path; matching="emd" replaces
    the matched output with the EMD transport argmax
    (classification/models/samplenet_model.py:152-168 — see
    ops.matching.emd_matching for the documented argmax-axis fix).
    """

    @jax.jit
    def step(points, labels):
        simp, matched = sampler.apply(s_vars, points, training=False)
        if matching == "emd":
            matched = emd_matching(points, simp)
        out = matched if match_output else simp
        logits, _ = classifier.apply(c_vars, out, training=False)
        _, idx = chunked_min_argmin(simp, points)
        uniq = jnp.sum(first_occurrence_mask(idx), axis=1)
        # per-sample NLL (not batch mean) so tail-batch padding can be sliced
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        return jnp.argmax(logits, -1) == labels, nll, uniq

    oks, losses, uniques = [], [], []
    num_classes = None
    per_class_seen = per_class_ok = None
    for bx, by, real in iterate_batches_padded(data, labels, batch_size):
        ok, nll, uniq = step(jnp.asarray(bx), jnp.asarray(by))
        ok = np.asarray(ok)[:real]
        by = by[:real]
        oks.append(ok)
        losses.append(np.asarray(nll)[:real])
        uniques.append(np.asarray(uniq)[:real])
        if num_classes is None:
            num_classes = int(max(labels)) + 1
            per_class_seen = np.zeros(num_classes)
            per_class_ok = np.zeros(num_classes)
        for label, o in zip(by, ok):
            per_class_seen[label] += 1
            per_class_ok[label] += float(o)
    return {
        "accuracy": float(np.mean(np.concatenate(oks))),
        "loss": float(np.mean(np.concatenate(losses))),
        "mean_unique_nn": float(np.mean(np.concatenate(uniques))),
        "per_class_accuracy": per_class_ok / np.maximum(per_class_seen, 1),
    }


def evaluate_baseline_sampler(
    classifier: PointNetClassifier, c_vars: dict,
    data: np.ndarray, labels: np.ndarray, batch_size: int,
    num_out_points: int, *, sampler: str = "fps", seed: int = 0,
) -> dict:
    """Non-learned sampling baselines for the classification eval — the
    reference's FPS/Random comparison rows (registration/src/fps.py:8-43,
    random_sampling.py:7-46; the paper's Fig. 4 baselines).

    sampler="fps": greedy FPS from index 0; "random": per-cloud uniform
    choice without replacement (seeded, deterministic).
    """
    from samplenet_tpu.ops.fps import (
        farthest_point_sample_with_points,
        gather_point,
    )

    if sampler == "fps":
        @jax.jit
        def pick(points):
            return farthest_point_sample_with_points(
                num_out_points, points)[1]
    elif sampler == "random":
        def pick(points, _rng=np.random.RandomState(seed)):
            idx = np.stack([
                _rng.choice(points.shape[1], num_out_points, replace=False)
                for _ in range(points.shape[0])])
            return jnp.take_along_axis(
                points, jnp.asarray(idx)[..., None], axis=1)
    else:
        raise ValueError(f"unknown baseline sampler {sampler!r}")

    @jax.jit
    def classify(sampled, labels):
        logits, _ = classifier.apply(c_vars, sampled, training=False)
        return jnp.argmax(logits, -1) == labels

    oks = []
    for bx, by, real in iterate_batches_padded(data, labels, batch_size):
        sampled = pick(jnp.asarray(bx))
        oks.append(np.asarray(classify(sampled, jnp.asarray(by)))[:real])
    return {"accuracy": float(np.mean(np.concatenate(oks))),
            "sampler": sampler, "m": num_out_points}


DUMP_TREES = ("simplified", "soft_projected", "hard_projected", "sampled")


def infer_and_dump(
    sampler: SampleNet, state, data: np.ndarray, labels: np.ndarray,
    out_dir: str, *, num_out_points: int, batch_size: int = 32,
) -> dict[str, str]:
    """Run ordered inference and write the four h5 dump trees."""
    infer = make_progressive_infer_step(sampler, num_out_points)
    outs = {k: [] for k in DUMP_TREES}
    kept_labels = []
    for bx, by, real in iterate_batches_padded(data, labels, batch_size):
        simp, soft, hard, matched = infer(state, jnp.asarray(bx))
        for key, val in zip(DUMP_TREES, (simp, soft, hard, matched)):
            outs[key].append(np.asarray(val)[:real])
        kept_labels.append(by[:real])
    kept_labels = np.concatenate(kept_labels)
    paths = {}
    for key in DUMP_TREES:
        d = os.path.join(out_dir, key)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "dump.h5")
        save_h5(path, np.concatenate(outs[key]), kept_labels,
                data_dtype="float32", label_dtype="uint8")
        paths[key] = path
    return paths


def evaluate_from_files(
    classifier: PointNetClassifier, c_vars: dict,
    dump_path: str, sizes: list[int], batch_size: int = 32,
) -> dict[int, float]:
    """Accuracy at prefix sizes of a dumped ordered cloud file."""
    data, labels = load_h5(dump_path)

    @jax.jit
    def classify(points, labels):
        logits, _ = classifier.apply(c_vars, points, training=False)
        return jnp.argmax(logits, -1) == labels

    out = {}
    for size in sizes:
        oks = []
        for bx, by, real in iterate_batches_padded(data, labels, batch_size):
            oks.append(np.asarray(classify(jnp.asarray(bx[:, :size]),
                                           jnp.asarray(by)))[:real])
        out[size] = float(np.mean(np.concatenate(oks)))
    return out
