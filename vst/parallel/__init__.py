"""vst.parallel — mesh construction and sharding helpers."""

from vst.parallel.mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
]
