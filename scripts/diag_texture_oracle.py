"""Oracle-ceiling check for the textured benchmark scene (CPU-only).

Quantifies the two properties the texture benchmark is built on
(`make_textured_scene(96, 96, seed=3407, cells_per_class=2)` — the shared
scene of `comparison_table.py --texture` / `texture_table.py`):

1. a per-pixel classifier is at CHANCE — SVM-RBF on raw spectra, the winner
   on the spectrally-separable default scene, collapses here by construction
   (identical per-pixel marginals across classes);
2. the task is comfortably solvable from 9x9 windows at 10 labels/class —
   hand-crafted phase-invariant texture features (spatial autocorrelations
   of the leading spectral component at 10 lags) + logistic regression
   reach ~93 OA.

The gap between (2) and a model's protocol row is therefore model/pretrain
quality, not task noise: ~93 is the practical ceiling including the ~37 %
of test pixels whose 9x9 window straddles a texture-region boundary.

Run: python scripts/diag_texture_oracle.py  (~1 min, numpy+sklearn only).
Measured 2026-08-19: logreg 93.04, svm-rbf-on-features 90.97,
per-pixel svm 16.99 (chance = 1/6).
"""

import sys

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

sys.path.insert(0, "/root/repo")

from hsimae_tpu.data.gwpca import apply_gwpca  # noqa: E402
from hsimae_tpu.data.sampling import sample_per_class  # noqa: E402
from hsimae_tpu.data.synthetic import make_textured_scene  # noqa: E402

LAGS = [(0, 1), (1, 0), (1, 1), (0, 2), (2, 0),
        (2, 2), (0, 3), (3, 0), (1, 2), (2, 1)]


def autocorr_features(scene: np.ndarray) -> np.ndarray:
    """[h, w, n_lags] spatial autocorrelations of each pixel's 9x9 window,
    computed on the window's per-patch-standardized leading spectral
    component — invariant to texture phase and illumination scale."""
    h, w, bands = scene.shape
    pad = np.pad(scene, ((4, 4), (4, 4), (0, 0)), mode="symmetric")
    win = sliding_window_view(pad, (9, 9), axis=(0, 1))  # [h, w, B, 9, 9]
    win = np.moveaxis(win, 2, -1)  # [h, w, 9, 9, B]

    flat = scene.reshape(-1, bands)
    sub = flat[np.random.default_rng(0).choice(len(flat), 4000, replace=False)]
    _, _, vt = np.linalg.svd(sub - sub.mean(0), full_matrices=False)
    proj = win @ vt[0]  # [h, w, 9, 9]
    proj = proj - proj.mean(axis=(2, 3), keepdims=True)
    proj = proj / (proj.std(axis=(2, 3), keepdims=True) + 1e-6)

    def corr(dr, dc):
        s1 = proj[:, :, dr:, dc:]
        s2 = proj[:, :, :9 - dr, :9 - dc]
        return (s1 * s2).mean(axis=(2, 3))

    return np.stack([corr(*lag) for lag in LAGS], axis=-1)


def main():
    scene_raw, gt = make_textured_scene(96, 96, bands=103, seed=3407,
                                        cells_per_class=2)
    scene = apply_gwpca(scene_raw, 32)
    h, w, bands = scene.shape
    feats = autocorr_features(scene)

    rng = np.random.default_rng(3407)
    train_idx, test_gt_flat = sample_per_class(gt.ravel(), 10, rng=rng)
    tr_r, tr_c = train_idx // w, train_idx % w
    ytr = gt[tr_r, tr_c]
    mask = test_gt_flat > 0
    yte = test_gt_flat[mask]

    from sklearn.linear_model import LogisticRegression
    from sklearn.svm import SVC

    xtr, xte = feats[tr_r, tr_c], feats.reshape(-1, len(LAGS))[mask]
    for name, clf in [("logreg-on-autocorr", LogisticRegression(max_iter=2000)),
                      ("svm-rbf-on-autocorr", SVC(C=10, gamma="scale"))]:
        clf.fit(xtr, ytr)
        oa = float((clf.predict(xte) == yte).mean())
        print(f"{name}: OA {100 * oa:.2f} ({len(yte)} test px)")

    clf = SVC(C=10, gamma="scale")
    clf.fit(scene[tr_r, tr_c], ytr)
    oa = float((clf.predict(scene.reshape(-1, bands)[mask]) == yte).mean())
    print(f"per-pixel svm-rbf (raw spectra): OA {100 * oa:.2f} "
          f"(chance {100 / 6:.1f})")


if __name__ == "__main__":
    main()
