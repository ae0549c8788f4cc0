from samplenet_tpu.ops.pallas.soft_projection_kernel import (  # noqa: F401
    fused_soft_projection,
    soft_project,
)
from samplenet_tpu.ops.pallas.chamfer_kernel import (  # noqa: F401
    nn_direction,
    nn_distance_pallas,
    nn_snap,
)
from samplenet_tpu.ops.pallas.fps_kernel import (  # noqa: F401
    farthest_point_sample_pallas,
    fps_from_given_pallas,
)
