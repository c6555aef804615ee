"""On-device patch gathering — the TPU-native input pipeline.

The reference materializes every patch on host (2+ GB for a full scene:
`/root/reference/Utils/Preprocessing.py:205-212`) and pays a host->device copy
per batch. Here scenes live in HBM once (a few MB each) and batches of
patches are gathered *inside jit* from int32 index batches, so the only
host->device traffic per step is the index table slice. Flip augmentation is
also done on device from PRNG keys.

Patch layout is channels-last ``[B, ps, ps, C]`` (TPU lane dim = bands).
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pad_scene(scene: np.ndarray, pad: int) -> np.ndarray:
    """Symmetric pad, as the reference uses for odd patch sizes
    (`Utils/Preprocessing.py:209`)."""
    return np.pad(scene, ((pad, pad), (pad, pad), (0, 0)), mode="symmetric")


def _flat_take(flat: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather with a FLATTENED index vector. The TPU (Mosaic/axon)
    compiler handles 1-D-index gathers well but takes pathologically long to
    compile the same gather with a multi-dim index array — measured minutes
    vs <1s for [B, 9, 9] vs [B*81] indices — so every gather here flattens
    first and reshapes after."""
    b = idx.shape
    out = jnp.take(flat, idx.reshape(-1), axis=0)
    return out.reshape(*b, flat.shape[-1])


@functools.partial(jax.jit, static_argnums=(2, 3))
def _gather_patches(flat: jax.Array, starts: jax.Array, width: int, ps: int) -> jax.Array:
    """Gather ``[B, ps, ps, C]`` windows from a flattened ``[H*W, C]`` scene."""
    d = jnp.arange(ps, dtype=starts.dtype)
    rows = starts[:, 0:1] + d[None, :]  # [B, ps]
    cols = starts[:, 1:2] + d[None, :]  # [B, ps]
    idx = rows[:, :, None] * width + cols[:, None, :]  # [B, ps, ps]
    return _flat_take(flat, idx)  # [B, ps, ps, C]


def gather_multiscene(
    flat: jax.Array,      # [sum(h*w), C] all scenes concatenated
    widths: jax.Array,    # [n_scenes] int32
    bases: jax.Array,     # [n_scenes] int32 flat offsets
    mins: jax.Array,      # [n_scenes] f32 per-scene norm constants
    maxs: jax.Array,      # [n_scenes] f32
    locs: jax.Array,      # [B, 3] int32 (row, col, scene_id)
    ps: int,
) -> jax.Array:
    """Pure multi-scene window gather + per-scene normalize. Traceable inside
    any jitted step (the fused pretrain path closes over the scene buffers)."""
    locs = locs.astype(jnp.int32)
    r, c, sid = locs[:, 0], locs[:, 1], locs[:, 2]
    w = jnp.take(widths, sid)  # [B]
    base = jnp.take(bases, sid) + r * w + c  # [B]
    d = jnp.arange(ps, dtype=jnp.int32)
    idx = base[:, None, None] + d[None, :, None] * w[:, None, None] + d[None, None, :]
    # upcast AFTER the gather: the resident buffer may be bf16 (big corpora)
    # but patches normalize and train in f32/compute_dtype downstream
    x = _flat_take(flat, idx).astype(mins.dtype)  # [B, ps, ps, C]
    mn = jnp.take(mins, sid)[:, None, None, None]
    mx = jnp.take(maxs, sid)[:, None, None, None]
    return (x - mn) / (mx - mn)


class ScenePatchSource:
    """One scene resident on device; gathers patches by pixel id or window start.

    * ``gather_pixels(idx)``  — per-pixel patches from the symmetric-padded
      scene: pixel (r, c) -> window starting at (r, c) in the padded scene.
      These are the reference's ``data_cubes`` (`Preprocessing.py:209-212`).
    * ``gather_windows(starts)`` — windows of the *unpadded* scene (the
      unlabeled pool / pretraining cuts).
    """

    def __init__(self, scene: np.ndarray, patch_size: int = 9):
        # odd ps: window [r-ps//2, r+ps//2]; even ps: [r-ps//2, r+ps//2) —
        # both match the reference's symmetric pad by ps//2
        # (`Utils/Preprocessing.py:209`, used with even sizes by GSC-ViT)
        self.h, self.w, self.c = scene.shape
        self.patch_size = patch_size
        pad = patch_size // 2
        padded = _pad_scene(np.asarray(scene, dtype=np.float32), pad)
        self.pw = padded.shape[1]
        self._flat_padded = jnp.asarray(padded.reshape(-1, self.c))
        self._flat = jnp.asarray(np.ascontiguousarray(scene, dtype=np.float32).reshape(-1, self.c))

    @property
    def n_pixels(self) -> int:
        return self.h * self.w

    def gather_pixels(self, pixel_idx: jax.Array) -> jax.Array:
        pixel_idx = jnp.asarray(pixel_idx, dtype=jnp.int32)
        starts = jnp.stack([pixel_idx // self.w, pixel_idx % self.w], axis=-1)
        return _gather_patches(self._flat_padded, starts, self.pw, self.patch_size)

    def gather_windows(self, starts: jax.Array) -> jax.Array:
        starts = jnp.asarray(starts, dtype=jnp.int32)
        return _gather_patches(self._flat, starts, self.w, self.patch_size)


class MultiScenePatchSource:
    """Many scenes (different shapes) in one flat device buffer.

    Pretraining over HSIHybrid keeps ~15 GWPCA'd scenes resident (~200 MB)
    and gathers 9x9 cuts by ``(row, col, scene_id)`` rows of the
    :class:`PretrainCutIndex`. Per-scene (min, max) normalization happens in
    the same fused gather (identity when norm was disabled, reference
    default: `Model_Pretraining.py:44-45` with max=1, min=0).
    """

    def __init__(
        self,
        scenes: Sequence[np.ndarray],
        patch_size: int = 9,
        scene_min: Optional[np.ndarray] = None,
        scene_max: Optional[np.ndarray] = None,
        storage_dtype=np.float32,
    ):
        """``storage_dtype=jnp.bfloat16`` halves HBM residency AND the
        host->device upload time of a big corpus (the 15-scene HSIHybrid-scale
        buffer is 4.6 GB f32 — measured 300 s through the tunnel, and enough
        to OOM the multi-tenant chip alongside the bs=2048 train step).
        Gathered patches are upcast to f32 before normalization either way,
        so the only precision loss is the 8-bit mantissa of the STORED
        reflectance values — far below the GWPCA reconstruction error."""
        self.patch_size = patch_size
        c = scenes[0].shape[-1]
        assert all(s.shape[-1] == c for s in scenes)
        self.c = c
        widths, bases = [], []
        offset = 0
        flats = []
        for s in scenes:
            h, w, _ = s.shape
            widths.append(w)
            bases.append(offset)
            offset += h * w
            # cast per-scene BEFORE concat (halves peak host memory for
            # narrow storage dtypes); copy=False keeps the default f32 path
            # zero-copy for already-contiguous scenes
            flats.append(np.ascontiguousarray(s).reshape(-1, c)
                         .astype(storage_dtype, copy=False))
        self._flat = jnp.asarray(np.concatenate(flats, axis=0))
        self._widths = jnp.asarray(np.array(widths, dtype=np.int32))
        self._bases = jnp.asarray(np.array(bases, dtype=np.int32))
        n = len(scenes)
        self._min = jnp.asarray(
            scene_min if scene_min is not None else np.zeros(n), dtype=jnp.float32
        )
        self._max = jnp.asarray(
            scene_max if scene_max is not None else np.ones(n), dtype=jnp.float32
        )
        # The scene buffer is an ARGUMENT of the jitted gather, never a
        # closure capture: a captured device array is embedded in the lowered
        # program as a constant — at HSIHybrid scale (15 scenes, ~5 GB) that
        # ships gigabytes into every remote compile and duplicates the buffer
        # in the executable. Passing it as an argument is free (device arrays
        # pass by reference).
        ps = self.patch_size
        self._gather = jax.jit(
            lambda flat, widths, bases, mn, mx, locs: gather_multiscene(
                flat, widths, bases, mn, mx, locs, ps
            )
        )

    def gather(self, locs) -> jax.Array:
        return self._gather(
            self._flat, self._widths, self._bases, self._min, self._max,
            jnp.asarray(locs),
        )


def augment_flips(x: jax.Array, key: jax.Array, p: float = 0.5) -> jax.Array:
    """Per-sample random horizontal/vertical flips of ``[B, h, w, C]`` patches.

    Matches the reference's train-time augmentation
    (`Model_Pretraining.py:28-38`): horizontal = flip the width axis,
    vertical = flip the height axis, each with prob 0.5 independently.
    """
    kh, kv = jax.random.split(key)
    fh = jax.random.bernoulli(kh, p, (x.shape[0],))
    fv = jax.random.bernoulli(kv, p, (x.shape[0],))
    x = jnp.where(fh[:, None, None, None], x[:, :, ::-1, :], x)
    x = jnp.where(fv[:, None, None, None], x[:, ::-1, :, :], x)
    return x


def batch_indices(
    n: int,
    batch_size: int,
    rng=None,
    shuffle: bool = True,
    pad_to_full: bool = True,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield ``(index_batch, valid_mask)`` covering ``range(n)`` once.

    The final partial batch is padded (wrapping) to keep jit shapes static;
    ``valid_mask`` marks real rows so losses/metrics can ignore padding.
    """
    order = (rng or np.random).permutation(n) if shuffle else np.arange(n)
    for i in range(0, n, batch_size):
        chunk = order[i : i + batch_size]
        valid = np.ones(len(chunk), dtype=bool)
        if len(chunk) < batch_size and pad_to_full:
            need = batch_size - len(chunk)
            fill = np.resize(order, need)  # tile if the pool is tiny
            chunk = np.concatenate([chunk, fill])
            valid = np.concatenate([valid, np.zeros(need, dtype=bool)])
        yield chunk, valid
