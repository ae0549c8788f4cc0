"""samplenet-tpu: TPU-native differentiable point-cloud sampling framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of itailang/SampleNet
("SampleNet: Differentiable Point Cloud Sampling", CVPR 2020): task-aware
differentiable sampling (SampleNet + SampleNetProgressive), three task tracks
(PointNet classification, point-cloud autoencoding, PCRNet registration), a
fused ops library (Chamfer/nn-distance, batched kNN + grouping, farthest point
sampling, approximate EMD matching), and SPMD data/tensor parallelism over a
`jax.sharding.Mesh`.

Layout convention: point clouds are `[B, N, 3]` ("bnc") everywhere internally;
modules that mirror the reference API accept `input_shape`/`output_shape` in
{"bnc", "bcn"} for drop-in parity with `registration/src/samplenet.py`.
"""

__version__ = "0.1.0"

from samplenet_tpu.ops import (  # noqa: F401
    nn_distance,
    chamfer_distance,
    knn_point,
    group_point,
    farthest_point_sample,
    gather_point,
    approx_match,
    match_cost,
    emd_loss,
    emd_matching,
    nn_matching,
    nn_match_indices,
    nn_match_from_clouds,
    chamfer_loss,
    fps_from_given,
    query_ball_point,
    prob_sample,
)
