"""Named dataset registry + loaders.

Equivalent of ``get_data_path`` (`/root/reference/Compared_Experiment.py:338-351`)
with the hard-coded Windows paths replaced by a root-relative layout:

    <root>/<dir>/data.npy    [h, w, bands] float
    <root>/<dir>/gt.npy      [h, w] int, 0 = background

The root defaults to ``$HSIMAE_DATA_ROOT`` (or ``./datasets``). Expected
shapes (from the reference harness configs, `Compared_Experiment.py:354-451`)
are validated on load. The HSIHybrid pretraining corpus is a directory of
scene ``.npy`` cubes (`/root/reference/README.md:9,39`).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class DatasetInfo:
    name: str
    dirname: str
    bands: int
    n_classes: int  # including background class 0


REGISTRY = {
    "Salinas": DatasetInfo("Salinas", "Salinas", 204, 17),
    "PaviaU": DatasetInfo("PaviaU", "PaviaU", 103, 10),
    "Houston2013": DatasetInfo("Houston2013", "Houston2013", 144, 16),
    "LongKou": DatasetInfo("LongKou", "WHU-Hi-LongKou", 270, 10),
}


def data_root(root: Optional[str] = None) -> str:
    return root or os.environ.get("HSIMAE_DATA_ROOT", "datasets")


def get_data_path(name: str, root: Optional[str] = None) -> Tuple[str, str]:
    info = REGISTRY[name]
    base = os.path.join(data_root(root), info.dirname)
    return os.path.join(base, "data.npy"), os.path.join(base, "gt.npy")


def load_dataset(name: str, root: Optional[str] = None,
                 validate: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """-> (scene [h, w, bands] float32, gt [h, w] int32)."""
    info = REGISTRY[name]
    dp, gp = get_data_path(name, root)
    scene = np.asarray(np.load(dp), np.float32)
    gt = np.asarray(np.load(gp)).astype(np.int32)
    if validate:
        assert scene.ndim == 3 and scene.shape[:2] == gt.shape, (scene.shape, gt.shape)
        assert scene.shape[-1] == info.bands, (
            f"{name}: expected {info.bands} bands, got {scene.shape[-1]}")
        assert int(gt.max()) + 1 <= info.n_classes
    return scene, gt


def load_pretrain_corpus(directory: str, limit: Optional[int] = None) -> List[np.ndarray]:
    """Load every ``*.npy`` scene cube in a directory (HSIHybrid layout)."""
    files = sorted(f for f in os.listdir(directory) if f.endswith(".npy"))
    if limit:
        files = files[:limit]
    return [np.load(os.path.join(directory, f)) for f in files]
