from samplenet_tpu.data import augment  # noqa: F401
from samplenet_tpu.data.modelnet import (  # noqa: F401
    load_h5,
    save_h5,
    load_split,
    iterate_batches,
    iterate_batches_padded,
    MODELNET40_CLASSES,
)
from samplenet_tpu.data.procedural import make_dataset, CLASS_NAMES  # noqa: F401
from samplenet_tpu.data.plyio import load_ply, save_ply  # noqa: F401
from samplenet_tpu.data import pctransforms  # noqa: F401
from samplenet_tpu.data.shapenet import (  # noqa: F401
    PointCloudDataSet,
    train_val_test_split,
    SYNSET_TO_CATEGORY,
    CATEGORY_TO_SYNSET,
)
from samplenet_tpu.data.qdataset import QuaternionFixedDataset  # noqa: F401
