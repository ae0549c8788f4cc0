from samplenet_tpu.train.state import (  # noqa: F401
    TrainState,
    staircase_lr,
    adam_with_schedule,
)
from samplenet_tpu.train import checkpoints  # noqa: F401
