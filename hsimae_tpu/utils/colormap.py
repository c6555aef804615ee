"""Label-map -> RGB colormap for scene classification PNGs.

Same fixed 20-entry palette as the reference
(`/root/reference/Utils/Label_to_Colormap.py:4-31`); class 0 renders black.
Vectorized as a palette lookup instead of the reference's per-class loop.
"""

from __future__ import annotations

import numpy as np

# Palette indexed by class id; VOC-style bit-reversal colors.
_PALETTE = np.array(
    [
        [0, 0, 0],
        [128, 0, 0],
        [0, 128, 0],
        [128, 128, 0],
        [0, 0, 128],
        [128, 0, 128],
        [0, 128, 128],
        [0, 64, 128],
        [64, 0, 0],
        [192, 0, 0],
        [64, 128, 0],
        [192, 128, 0],
        [64, 0, 128],
        [192, 0, 128],
        [64, 128, 128],
        [192, 128, 128],
        [0, 64, 0],
        [128, 64, 0],
        [0, 192, 0],
        [128, 192, 0],
    ],
    dtype=np.uint8,
)


def label_to_colormap(label: np.ndarray) -> np.ndarray:
    label = np.asarray(label, dtype=np.int64)
    assert label.max(initial=0) < len(_PALETTE), "only 20 classes are supported"
    return _PALETTE[label]


def save_colormap(path: str, label: np.ndarray) -> None:
    import matplotlib.image as mi

    mi.imsave(path, label_to_colormap(label))
