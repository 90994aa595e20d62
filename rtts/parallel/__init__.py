from rtts.parallel.mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from rtts.parallel.serving import (
    data_parallel_size,
    replicate_for_serving,
    shard_for_serving,
    shard_request_batch,
)
from rtts.parallel.sharding import (
    batch_sharding,
    opt_state_shardings,
    replicated,
    shard_batch,
    param_sharding_rules,
)

__all__ = [
    "make_mesh",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "param_sharding_rules",
    "opt_state_shardings",
    "data_parallel_size",
    "replicate_for_serving",
    "shard_for_serving",
    "shard_request_batch",
]
