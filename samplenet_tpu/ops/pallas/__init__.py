from samplenet_tpu.ops.pallas.soft_projection_kernel import (  # noqa: F401
    fused_soft_projection,
    soft_project,
)
from samplenet_tpu.ops.pallas.chamfer_kernel import (  # noqa: F401
    nn_direction,
    nn_distance_pallas,
)
from samplenet_tpu.ops.pallas.fps_kernel import (  # noqa: F401
    farthest_point_sample_pallas,
    fps_from_given_pallas,
)
from samplenet_tpu.ops.pallas.encoder_kernel import (  # noqa: F401
    fused_point_encoder,
    fold_bn_params,
)
from samplenet_tpu.ops.pallas.emd_kernel import (  # noqa: F401
    approx_match_pallas,
)
