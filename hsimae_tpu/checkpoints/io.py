"""Checkpoint save / restore / partial-restore.

The reference only ever saves a final ``state_dict`` and loads by key-name
intersection (`/root/reference/Model_Pretraining.py:111`,
`/root/reference/Model_Finetuning.py:87-96,253-261`). This module keeps that
partial-restore-by-intersection semantic and adds what the reference lacks:
periodic, atomic, resumable full-train-state checkpoints (step + params +
optimizer state + PRNG key), so a preempted 4M-patch pretrain resumes instead
of restarting.

Format: one msgpack file per checkpoint (flax.serialization) plus a JSON
sidecar with step/metadata. Atomic via write-to-temp + rename.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def uncovered_leaves(target_params, loaded_paths) -> set:
    """Paths of ``target_params`` leaves NOT covered by a partial restore —
    i.e. still at their init values after ``partial_restore(target, src)``
    returned ``loaded_paths``. Callers use this to hard-fail when critical
    modules (e.g. the classification head) were left at random init."""
    return set(_flatten(target_params)) - set(loaded_paths)


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> dict:
    tree: dict = {}
    for path, leaf in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return tree


def save_checkpoint(directory: str, step: int, state, metadata: Optional[dict] = None) -> str:
    """Atomically save a pytree ``state`` as ``ckpt_{step}.msgpack``."""
    os.makedirs(directory, exist_ok=True)
    state = jax.device_get(state)
    path = os.path.join(directory, f"ckpt_{step}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(state))
    os.replace(tmp, path)
    meta = {"step": int(step), **(metadata or {})}
    mtmp = path + ".json.tmp"
    with open(mtmp, "w") as f:
        json.dump(meta, f)
    os.replace(mtmp, path + ".json")
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        m = re.fullmatch(r"ckpt_(\d+)\.msgpack", name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(directory, name)
    return best


def restore_checkpoint(path: str, target):
    """Restore a checkpoint into the structure of ``target`` (same pytree)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def save_params(path: str, params) -> str:
    """Save a bare parameter tree (the reference's ``torch.save(state_dict)``
    analogue, `/root/reference/Model_Pretraining.py:111`)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    os.replace(tmp, path)
    return path


def load_params(path: str, target=None):
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def partial_restore(params, source: dict, verbose: bool = True):
    """Key-intersection partial restore (`Model_Finetuning.py:87-96`).

    Every leaf of ``source`` whose full path exists in ``params`` with a
    matching shape replaces the target leaf; everything else is ignored.
    Returns ``(new_params, loaded_paths, skipped_paths)``.
    """
    tgt = _flatten(params)
    src = _flatten(source)
    loaded, skipped = [], []
    out = dict(tgt)
    for path, leaf in src.items():
        if path in tgt and np.shape(leaf) == np.shape(tgt[path]):
            out[path] = np.asarray(leaf, dtype=np.asarray(tgt[path]).dtype)
            loaded.append(path)
        else:
            skipped.append(path)
    if verbose:
        print(f"[partial_restore] loaded {len(loaded)} / target {len(tgt)} leaves; "
              f"ignored {len(skipped)} source leaves")
    return _unflatten(out), loaded, skipped
