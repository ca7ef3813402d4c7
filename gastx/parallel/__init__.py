from gastx.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
]
