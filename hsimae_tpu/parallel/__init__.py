from hsimae_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate,
    pad_to_multiple,
    local_mesh_info,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "pad_to_multiple",
    "local_mesh_info",
]
