from hsimae_tpu.checkpoints.io import (
    save_checkpoint,
    latest_checkpoint,
    restore_checkpoint,
    save_params,
    load_params,
    partial_restore,
)
from hsimae_tpu.checkpoints.orbax_io import OrbaxCheckpointer
from hsimae_tpu.checkpoints.torch_convert import (
    convert_torch_state_dict,
    load_torch_checkpoint,
    export_torch_state_dict,
)

__all__ = [
    "save_checkpoint",
    "latest_checkpoint",
    "restore_checkpoint",
    "save_params",
    "load_params",
    "partial_restore",
    "OrbaxCheckpointer",
    "convert_torch_state_dict",
    "load_torch_checkpoint",
    "export_torch_state_dict",
]
