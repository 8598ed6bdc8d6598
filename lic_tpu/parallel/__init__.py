"""Multi-chip scaling: mesh construction, sharding rules, multi-host."""

from .distributed import global_mesh_info, initialize_multihost
from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    spatial_sharding,
)

__all__ = [
    "global_mesh_info",
    "initialize_multihost",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "spatial_sharding",
]
