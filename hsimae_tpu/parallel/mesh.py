"""Device mesh and sharding setup.

The reference is single-GPU (`/root/reference/Model_Pretraining.py:59`); here
data-parallel scale-out is first-class. The design follows the standard JAX
recipe: build a ``Mesh`` over (data, model) axes, annotate the batch with
``P('data')`` and parameters with ``P()`` (replicated; a future tensor axis
would shard attention heads / MLP hidden over ``'model'``), and let XLA insert
the gradient all-reduce over ICI inside the jitted train step.

Works identically on real TPU slices and on the virtual CPU mesh used by
tests (``--xla_force_host_platform_device_count``).

Multi-host note: this module targets single-controller processes (one host,
N local devices — the environments this repo runs in). On a multi-host slice
the same mesh code works under jax.distributed, but ``shard_batch`` must be
replaced by ``jax.make_array_from_process_local_data`` so each host feeds
only its local shard of the HSIHybrid cut index (the index-table design
already partitions trivially: slice ``locs`` by ``jax.process_index()``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. ``data=-1`` consumes all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split over the data axis; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch (pytree of arrays, leading dim = batch) onto the
    mesh, split over 'data'. Batch dim must divide the data axis size."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def local_mesh_info(mesh: Optional[Mesh]) -> str:
    if mesh is None:
        return "no mesh (single device)"
    return f"mesh data={mesh.shape['data']} model={mesh.shape['model']} on {len(mesh.devices.flat)} {mesh.devices.flat[0].platform} devices"
