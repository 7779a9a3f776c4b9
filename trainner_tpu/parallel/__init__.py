from .mesh import (
    MeshConfig,
    batch_sharding,
    local_batch_slice,
    make_mesh,
    param_sharding,
    replicate,
    shard_batch,
)
from .spatial import make_spatial_mesh, spatial_infer

__all__ = [
    "MeshConfig", "batch_sharding", "local_batch_slice", "make_mesh",
    "param_sharding", "replicate", "shard_batch",
    "make_spatial_mesh", "spatial_infer",
]
