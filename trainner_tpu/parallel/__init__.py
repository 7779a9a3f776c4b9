from .mesh import (
    MeshConfig,
    batch_sharding,
    local_batch_slice,
    make_mesh,
    param_sharding,
    replicate,
    shard_batch,
)

__all__ = [
    "MeshConfig", "batch_sharding", "local_batch_slice", "make_mesh",
    "param_sharding", "replicate", "shard_batch",
]
