"""Multi-chip scaling: mesh construction and sharding rules."""

from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    spatial_sharding,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "spatial_sharding",
]
