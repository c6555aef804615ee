from hsimae_tpu.ops.metrics_ops import confusion_matrix_op, update_confusion
from hsimae_tpu.ops.fused_block import fused_encoder_block, FUSED_BLOCK_AVAILABLE

__all__ = [
    "confusion_matrix_op",
    "update_confusion",
    "fused_encoder_block",
    "FUSED_BLOCK_AVAILABLE",
]
