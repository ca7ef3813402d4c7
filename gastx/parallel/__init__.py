from gastx.parallel.mesh import (
    init_distributed,
    DATA_AXIS,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)

__all__ = [
    "init_distributed",
    "DATA_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
]
