"""Per-class few-shot samplers and train/val splitters.

Host-side, numpy, seeded — behavioral equivalents of
``get_data_set`` / ``get_data_set_dual`` / ``spilt_dataset``
(`/root/reference/Utils/Preprocessing.py:120-300`), except that patches are
never materialized: samplers return *pixel indices* into the padded per-pixel
patch grid, and the unlabeled pool is a table of window starts. Pixels are
gathered on device by :mod:`hsimae_tpu.data.pipeline`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from hsimae_tpu.data.gwpca import apply_gwpca
from hsimae_tpu.data.windows import patch_grid_indices


def _rng(rng) -> np.random.Generator:
    if rng is None:
        # The reference drives sampling from the globally seeded np.random
        # (`Utils/Preprocessing.py:227`); mirror that default.
        return np.random
    return rng


def sample_per_class(
    gt_flat: np.ndarray,
    num: Optional[int] = None,
    percent: Optional[float] = None,
    rng=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pick ``num`` (or ``ceil(percent * count)``) training pixels per class.

    Class 0 is background and never sampled. Quirk preserved from
    `Utils/Preprocessing.py:246-250`: a class whose population is exactly
    ``num`` contributes ``num - 5`` samples (so its test set is non-empty).

    Returns ``(train_index, test_gt_flat)`` where ``test_gt_flat`` equals
    ``gt_flat`` with the training pixels zeroed.
    """
    r = _rng(rng)
    gt_flat = np.asarray(gt_flat).reshape(-1)
    n_classes = int(gt_flat.max()) + 1

    shuffled = r.permutation(len(gt_flat))
    labels = gt_flat[shuffled]

    if percent is not None:
        counts = np.array([(gt_flat == l).sum() for l in range(n_classes)])
        quota = np.ceil(counts * percent)
    elif num is not None:
        quota = np.full(n_classes, float(num))
        counts = np.bincount(gt_flat, minlength=n_classes)
        quota[counts == num] = num - 5
    else:
        raise ValueError("one of num / percent required")

    taken = np.zeros(n_classes)
    train_index = []
    test_gt = gt_flat.copy()
    for pos, lab in zip(shuffled, labels):
        if lab == 0:
            continue
        taken[lab] += 1
        if taken[lab] <= quota[lab]:
            train_index.append(pos)
            test_gt[pos] = 0
    return np.array(train_index, dtype=np.int64), test_gt


def train_val_split(
    indices: np.ndarray, labels: np.ndarray, training_ratio: float = 0.5, rng=None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Stratified split of a labeled pool (labels are 1-based).

    Equivalent of ``spilt_dataset`` (`Utils/Preprocessing.py:276-300`): per
    class, the first ``count * (1 - ratio)`` encountered (in shuffled order)
    go to val, the rest to train.
    """
    r = _rng(rng)
    indices = np.asarray(indices)
    labels = np.asarray(labels)
    n_classes = int(labels.max())

    order = r.permutation(len(labels))
    counts = np.array([(labels == l + 1).sum() for l in range(n_classes)])
    val_quota = counts * (1.0 - training_ratio)
    taken = np.zeros(n_classes)

    tr, va = [], []
    for i in order:
        c = labels[i] - 1
        taken[c] += 1
        (va if taken[c] <= val_quota[c] else tr).append(i)
    if training_ratio == 1:
        va = tr[: int(len(tr) * 0.2)]
    tr, va = np.array(tr, dtype=np.int64), np.array(va, dtype=np.int64)
    return indices[tr], labels[tr], indices[va], labels[va]


@dataclasses.dataclass
class DualSceneSplit:
    """Everything dual-branch fine-tuning needs from one scene, index-based.

    Equivalent of the tuple returned by ``get_data_set_dual``
    (`Utils/Preprocessing.py:189-273`), with patch sets replaced by index
    tables over the (padded) scene:

    * ``scene``            — [h, w, c] preprocessed cube (GWPCA'd/normalized)
    * ``labeled_index``    — pixel ids (row-major) of the labeled pool
    * ``labels``           — gt at those pixels (1-based)
    * ``unlabeled_starts`` — [m, 2] window starts of the non-overlapping
                             unlabeled patch set (reference's data_cubes_2)
    * ``test_gt``          — gt with train pixels zeroed, shape [h, w]
    * ``gt``               — raw gt, shape [h, w]
    """

    scene: np.ndarray
    labeled_index: np.ndarray
    labels: np.ndarray
    unlabeled_starts: np.ndarray
    test_gt: np.ndarray
    gt: np.ndarray

    @property
    def n_classes(self) -> int:
        return int(self.gt.max()) + 1


def dual_scene_split(
    scene: np.ndarray,
    gt: np.ndarray,
    patch_size: int = 9,
    num: Optional[int] = None,
    percent: Optional[float] = None,
    norm: bool = False,
    gwpca: bool = True,
    nc: int = 32,
    rng=None,
) -> DualSceneSplit:
    """Scene-level preprocessing + dual labeled/unlabeled split."""
    scene = np.asarray(scene)
    gt = np.asarray(gt)
    assert scene.shape[:2] == gt.shape

    if gwpca:
        scene = apply_gwpca(scene, nc=nc, group=4, whiten=True)
    if norm:
        mn, mx = scene.min(), scene.max()
        scene = (scene - mn) / (mx - mn)
    scene = np.ascontiguousarray(scene, dtype=np.float32)

    h, w, _ = scene.shape
    # unlabeled pool: non-overlapping windows over the unpadded scene
    # (stride divisor 1 -> step = patch_size; `Preprocessing.py:205`)
    unlabeled_starts = patch_grid_indices(h, w, patch_size, stride=1)

    train_index, test_gt = sample_per_class(gt.reshape(-1), num=num, percent=percent, rng=rng)
    labels = gt.reshape(-1)[train_index]

    return DualSceneSplit(
        scene=scene,
        labeled_index=train_index,
        labels=labels.astype(np.int32),
        unlabeled_starts=unlabeled_starts.astype(np.int32),
        test_gt=test_gt.reshape(gt.shape),
        gt=gt,
    )
