from dafne_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    image_sharding,
    replicate_to_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "image_sharding",
    "replicate_to_mesh",
    "replicated_sharding",
    "shard_batch",
]
