"""TPU-native point-cloud ops library.

One implementation of each op (the reference carries byte-similar duplicate
CUDA trees in classification/ and reconstruction/external/). Pure-XLA
formulations are the source of truth; `samplenet_tpu.ops.pallas` carries
fused Pallas kernels for the hot paths which are tested against these.
"""

from samplenet_tpu.ops.pairwise import (  # noqa: F401
    pairwise_sqdist,
    chunked_min_argmin,
    chunked_topk_neg,
)
from samplenet_tpu.ops.chamfer import (  # noqa: F401
    nn_distance,
    chamfer_distance,
    chamfer_loss,
)
from samplenet_tpu.ops.knn import (  # noqa: F401
    knn_point,
    group_point,
    query_ball_point,
    select_top_k,
)
from samplenet_tpu.ops.fps import (  # noqa: F401
    farthest_point_sample,
    fps_from_given,
    gather_point,
    prob_sample,
    non_sampled,
)
from samplenet_tpu.ops.matching import (  # noqa: F401
    approx_match,
    match_cost,
    emd_loss,
    nn_matching,
    nn_match_indices,
    nn_match_from_clouds,
    emd_matching,
    first_occurrence_mask,
)
