"""Device mesh and sharding setup.

The reference is single-GPU (`/root/reference/Model_Pretraining.py:59`); here
data-parallel scale-out is first-class. The design follows the standard JAX
recipe: build a ``Mesh`` over (data, model) axes, annotate the batch with
``P('data')`` and parameters with ``P()`` (replicated; a future tensor axis
would shard attention heads / MLP hidden over ``'model'``), and let XLA insert
the gradient all-reduce over ICI inside the jitted train step.

Works identically on real TPU slices and on the virtual CPU mesh used by
tests (``--xla_force_host_platform_device_count``).

Multi-host: under ``jax.distributed`` each host feeds only its local shard of
the global batch. ``process_local_slice`` computes the contiguous rows of a
global batch owned by this process (the HSIHybrid cut-index design partitions
trivially: every host computes the same seeded epoch permutation and gathers
only its slice), and ``shard_batch`` assembles the global array from the
per-process shards via ``jax.make_array_from_process_local_data``. In a
single-process run both degrade to plain ``device_put`` semantics.
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


def process_local_slice(
    n: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> slice:
    """Rows of a length-``n`` global batch owned by this process.

    Contiguous block partition (process p gets ``[p*n//P, (p+1)*n//P)``),
    matching the process-contiguous device order of ``make_mesh`` so the
    local rows land on local devices. Single-process degenerate case:
    ``slice(0, n)``.
    """
    p = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return slice(p * n // pc, (p + 1) * n // pc)


def shard_batch(batch, mesh: Mesh, multihost: Optional[bool] = None):
    """Place a batch (pytree of arrays, leading dim = batch) onto the mesh,
    split over 'data'. Batch dim must divide the data axis size.

    Single-process: plain ``device_put``. Multi-host (``jax.process_count()
    > 1``, or ``multihost=True`` to force the path in tests): ``batch`` holds
    only THIS process's rows (see :func:`process_local_slice`) and the global
    array is assembled with ``jax.make_array_from_process_local_data``.
    """
    sh = batch_sharding(mesh)
    if multihost is None:
        multihost = jax.process_count() > 1
    if multihost:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch,
        )
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
