from samplenet_tpu.models.soft_projection import (  # noqa: F401
    SoftProjection,
    sigma_from_temperature,
)
from samplenet_tpu.models.samplenet import (  # noqa: F401
    SampleNet,
    SimplificationNet,
    FPSSampler,
    RandomSampler,
)
from samplenet_tpu.models.losses import (  # noqa: F401
    simplification_loss,
    reconstruction_simplification_loss,
    projection_loss,
)
