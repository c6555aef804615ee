"""Sliding-window geometry and the lazy pretraining cut index.

The reference materializes every window as a numpy array
(`/root/reference/Utils/Preprocessing.py:23-55`); on TPU we keep scenes
resident and gather patches on device, so this module only computes *index
tables* (window start offsets), never pixels.

``window_starts`` reproduces the reference's quirky ``get_inital_seq``
(`Utils/Preprocessing.py:8-20`): ``stride`` is an overlap DIVISOR — the step
between windows is ``size // stride`` (stride=1 -> non-overlapping,
stride=size -> per-pixel) — and the final window is clamped flush to the end
(``seq[-1] = length - size``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np


def window_starts(length: int, size: int, stride: int = 1) -> np.ndarray:
    """Start offsets of ``size``-wide windows with step ``size // stride``.

    Bit-exact port of the *behavior* of ``get_inital_seq``:
    evenly spaced every ``size // stride``, count covering the whole extent,
    last start clamped to ``length - size``.
    """
    assert size <= length
    step = int(size // stride)
    n1 = length // size
    l_r = length - n1 * size
    n2 = l_r // step
    l_rr = l_r - n2 * step
    num = int((n1 - 1) * stride + n2 + (1 if l_rr == 0 else 2))
    seq = np.arange(0, num * step, step)
    seq[-1] = length - size
    return seq


def patch_grid_indices(h: int, w: int, size: int, stride: int = 1) -> np.ndarray:
    """Row-major ``[n, 2]`` array of (row, col) window starts.

    Matches the reference's loop order in ``splitHSI`` (rows outer, cols
    inner, `Utils/Preprocessing.py:37-39`).
    """
    rs = window_starts(h, size, stride)
    cs = window_starts(w, size, stride)
    rr, cc = np.meshgrid(rs, cs, indexing="ij")
    return np.stack([rr.reshape(-1), cc.reshape(-1)], axis=-1)


@dataclasses.dataclass
class PretrainCutIndex:
    """Lazy patch index over a list of scenes, equivalent to the output of
    ``get_data_cut_file`` (`Utils/Preprocessing.py:82-117`) but without
    `(max, min)` baked per row — those live in per-scene arrays.

    Columns of ``locs``: (row, col, scene_id) as int32. Scene normalization
    constants are ``scene_max`` / ``scene_min`` (identity 1/0 when norm=False,
    as in the reference default).
    """

    locs: np.ndarray  # [n, 3] int32: row, col, scene
    scene_max: np.ndarray  # [n_scenes] float32
    scene_min: np.ndarray  # [n_scenes] float32

    def __len__(self) -> int:
        return len(self.locs)


def build_pretrain_cut_index(
    scene_shapes: Sequence[tuple],
    patch_size: int = 9,
    norm: bool = False,
    scene_ranges: Optional[Sequence[tuple]] = None,
    ratio: float = 1.0,
    coarse_from: int = 14,
    rng: Optional[np.random.Generator] = None,
) -> PretrainCutIndex:
    """Build the HSIHybrid-style cut index.

    Reference policy (`Utils/Preprocessing.py:101-110`): scenes with id <
    ``coarse_from`` use overlapping step-3 windows (stride divisor 3),
    shuffled and subsampled to ``ratio``; scenes from ``coarse_from`` on use
    non-overlapping step-9 windows (stride divisor 1).
    """
    rng = rng or np.random.default_rng(0)
    all_locs: List[np.ndarray] = []
    maxs, mins = [], []
    for sid, shape in enumerate(scene_shapes):
        h, w = shape[0], shape[1]
        if sid >= coarse_from:
            grid = patch_grid_indices(h, w, patch_size, stride=1)  # step = size
        else:
            grid = patch_grid_indices(h, w, patch_size, stride=3)  # step = size//3
            perm = rng.permutation(len(grid))
            grid = grid[perm][: int(len(grid) * ratio)]
        locs = np.concatenate(
            [grid, np.full((len(grid), 1), sid, dtype=np.int64)], axis=-1
        ).astype(np.int32)
        all_locs.append(locs)
        if norm and scene_ranges is not None:
            mn, mx = scene_ranges[sid]
        else:
            mn, mx = 0.0, 1.0
        maxs.append(mx)
        mins.append(mn)
    return PretrainCutIndex(
        locs=np.concatenate(all_locs, axis=0),
        scene_max=np.array(maxs, dtype=np.float32),
        scene_min=np.array(mins, dtype=np.float32),
    )
