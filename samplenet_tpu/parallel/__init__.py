from samplenet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    shard_params,
    param_sharding_rules,
    initialize_distributed,
)
from samplenet_tpu.parallel.input_pipeline import (  # noqa: F401
    global_batches,
    host_shard,
)
