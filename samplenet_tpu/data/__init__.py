from samplenet_tpu.data import augment  # noqa: F401
from samplenet_tpu.data.modelnet import (  # noqa: F401
    load_h5,
    save_h5,
    load_split,
    iterate_batches,
    MODELNET40_CLASSES,
)
from samplenet_tpu.data.procedural import make_dataset, CLASS_NAMES  # noqa: F401
