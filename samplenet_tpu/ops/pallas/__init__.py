from samplenet_tpu.ops.pallas.soft_projection_kernel import (  # noqa: F401
    fused_soft_projection,
    soft_project,
)
from samplenet_tpu.ops.pallas.chamfer_kernel import (  # noqa: F401
    nn_direction,
    nn_distance_pallas,
)
