"""vst.parallel — mesh construction and sharding helpers."""

from vst.parallel.mesh import (
    initialize_distributed,
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)

__all__ = [
    "initialize_distributed",
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
]
