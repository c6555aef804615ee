"""Synthetic hyperspectral scenes for tests and benchmarks.

No public HSI dataset ships with this environment, so end-to-end tests and
throughput benchmarks run on generated scenes: a Voronoi segmentation of the
plane into classes, each class with a smooth random spectral signature,
plus band-correlated noise and per-pixel illumination scaling. The result is
linearly separable enough that a correct model visibly learns (OA >> chance)
while remaining non-trivial.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def make_synthetic_scene(
    h: int = 64,
    w: int = 64,
    bands: int = 103,
    n_classes: int = 6,
    noise: float = 0.05,
    background_frac: float = 0.1,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Return ``(scene [h, w, bands] float32, gt [h, w] int32)``.

    ``gt`` uses the reference convention: 0 = background (unlabeled), classes
    are 1..n_classes.
    """
    rng = np.random.default_rng(seed)

    # smooth per-class signatures: random low-frequency Fourier mixtures
    x = np.linspace(0, 1, bands)
    sigs = np.zeros((n_classes, bands))
    for k in range(n_classes):
        for f in range(1, 6):
            sigs[k] += rng.normal() * np.sin(2 * np.pi * f * x + rng.uniform(0, 2 * np.pi)) / f
        sigs[k] = sigs[k] - sigs[k].min() + 0.2 + 0.3 * rng.random()

    # Voronoi class layout
    n_seeds = n_classes * 4
    pts = rng.uniform(0, 1, (n_seeds, 2)) * np.array([h, w])
    owners = rng.integers(1, n_classes + 1, n_seeds)
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    d2 = (rr[..., None] - pts[:, 0]) ** 2 + (cc[..., None] - pts[:, 1]) ** 2
    gt = owners[np.argmin(d2, axis=-1)].astype(np.int32)

    # background: random blobs set to 0
    n_bg = max(1, int(background_frac * n_seeds))
    bg_pts = rng.uniform(0, 1, (n_bg, 2)) * np.array([h, w])
    bg_r = rng.uniform(0.05, 0.15, n_bg) * min(h, w)
    for p, r in zip(bg_pts, bg_r):
        m = (rr - p[0]) ** 2 + (cc - p[1]) ** 2 < r**2
        gt[m] = 0

    illum = 1.0 + 0.2 * rng.standard_normal((h, w, 1))
    scene = sigs[np.maximum(gt, 1) - 1] * illum
    scene = scene + noise * rng.standard_normal((h, w, bands))
    # background pixels get a distinct flat spectrum
    scene[gt == 0] = 0.1 + noise * rng.standard_normal((int((gt == 0).sum()), bands))
    return scene.astype(np.float32), gt


def make_synthetic_pretrain_scenes(
    n_scenes: int = 3,
    size_range=(40, 80),
    bands: int = 103,
    seed: int = 0,
):
    """A small HSIHybrid-like corpus of varied-size scenes."""
    rng = np.random.default_rng(seed)
    scenes = []
    for i in range(n_scenes):
        h = int(rng.integers(*size_range))
        w = int(rng.integers(*size_range))
        s, _ = make_synthetic_scene(h, w, bands, n_classes=5, seed=seed + 100 + i)
        scenes.append(s)
    return scenes
