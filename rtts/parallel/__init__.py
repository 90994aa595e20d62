from rtts.parallel.mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from rtts.parallel.sharding import (
    batch_sharding,
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
]
