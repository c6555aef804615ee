"""On-device metric ops: confusion-matrix accumulation as one-hot matmuls.

The reference computes metrics on host with sklearn per epoch
(`/root/reference/Model_Finetuning.py:176-179`); accumulating the confusion
matrix on device instead means eval loops sync one small [C, C] matrix
instead of every logit batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confusion_matrix_op(
    y_true: jax.Array, y_pred: jax.Array, n_classes: int,
    weight: jax.Array | None = None,
) -> jax.Array:
    """[B] labels x [B] preds -> [n_classes, n_classes] counts (float32).

    One-hot matmul — runs on the MXU, jit/vmap/scan-friendly.
    """
    t = jax.nn.one_hot(y_true, n_classes, dtype=jnp.float32)
    p = jax.nn.one_hot(y_pred, n_classes, dtype=jnp.float32)
    if weight is not None:
        t = t * weight[:, None]
    return jnp.einsum("bi,bj->ij", t, p)


def update_confusion(
    cm: jax.Array, y_true: jax.Array, y_pred: jax.Array,
    weight: jax.Array | None = None,
) -> jax.Array:
    return cm + confusion_matrix_op(y_true, y_pred, cm.shape[0], weight)
