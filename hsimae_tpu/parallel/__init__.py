from hsimae_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate,
    pad_to_multiple,
    local_mesh_info,
)
from hsimae_tpu.parallel.tp import shard_params_tp, tp_spec

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "pad_to_multiple",
    "local_mesh_info",
    "shard_params_tp",
    "tp_spec",
]
