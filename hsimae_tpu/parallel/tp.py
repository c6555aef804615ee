"""Tensor-parallel parameter sharding over the mesh 'model' axis.

The HSIMAE workload doesn't need TP at its published sizes (SURVEY.md §2.6),
but the mesh API reserves a 'model' axis so larger configs scale without
code changes. The scheme is standard Megatron-style column/row splits, and is
expressed purely through parameter shardings — XLA's SPMD partitioner
(GSPMD) inserts the all-reduces:

* column-parallel (split the OUTPUT feature dim): attention q/k/v kernels
  (head dim partitions) and SwiGLU w1/w3,
* row-parallel (split the INPUT feature dim): attention proj and SwiGLU w2 —
  their outputs are partial sums that GSPMD all-reduces,
* biases of column-parallel layers split likewise; everything else
  (embeddings, norms, heads) is replicated.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_COLUMN = ("q", "k", "v", "w1", "w3")   # split output features
_ROW = ("proj", "w2")                    # split input features


def tp_spec(path: Tuple[str, ...], ndim: int) -> P:
    """PartitionSpec for one parameter leaf under tensor parallelism."""
    parts = [getattr(k, "key", str(k)) for k in path]
    leaf = parts[-1]
    module = parts[-2] if len(parts) >= 2 else ""
    # patch_embed.proj is the tokenizer, NOT attention out-proj: replicate
    if "patch_embed" in parts:
        return P(*([None] * ndim))
    if module in _COLUMN:
        if leaf == "kernel":
            return P(None, "model")
        if leaf == "bias":
            return P("model")
    if module in _ROW and leaf == "kernel":
        return P("model", None)
    return P(*([None] * ndim))


def shard_params_tp(params, mesh: Mesh):
    """Place a parameter pytree with Megatron-style TP shardings."""

    def place(path, leaf):
        spec = tp_spec(path, getattr(leaf, "ndim", 0))
        # axes that don't divide evenly stay replicated (tiny dims)
        for ax, name in enumerate(spec):
            if name == "model" and leaf.shape[ax] % mesh.shape["model"] != 0:
                spec = P(*([None] * leaf.ndim))
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
