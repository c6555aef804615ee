"""Where do HSIMAE's missing OA points live on the texture benchmark? (CPU)

Round-4 finding: on the shared textured scene the HSIMAE-S@v2 protocol row
(77.80 OA) loses 8-10 points in ONE class — per-class index 5, i.e. class 6,
the 3-period checkerboard (`_TEXTURES[5]`, `data/synthetic.py:85`) — on
every test seed, while classes 1-4 sit at 88-97%. This script localizes the
confusion two ways, both CPU-only (safe alongside a TPU job):

1. oracle confusion — the phase-invariant autocorrelation features +
   logistic regression (93 OA, `diag_texture_oracle.py`): is class 6
   separable IN PRINCIPLE at 10 labels/class, and from what does the
   oracle itself confuse it?
2. model confusion — re-run one protocol test finetune (lr 5e-4, seed 3407)
   from the carried v2 pretrain checkpoint on CPU and print the full-scene
   test confusion matrix.

Run: JAX_PLATFORMS=cpu python scripts/diag_class6_confusion.py
(~15-25 min; the finetune is the slow part).
"""

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_diag_comp_cache")

import numpy as np  # noqa: E402

from diag_texture_oracle import LAGS, autocorr_features  # noqa: E402

from hsimae_tpu.checkpoints.io import load_params  # noqa: E402
from hsimae_tpu.config import EvalConfig, FinetuneConfig, preset  # noqa: E402
from hsimae_tpu.data.gwpca import apply_gwpca  # noqa: E402
from hsimae_tpu.data.sampling import sample_per_class  # noqa: E402
from hsimae_tpu.data.synthetic import make_textured_scene  # noqa: E402
from hsimae_tpu.train.protocol import _run_one  # noqa: E402

CKPT = "/root/repo/artifacts/round_carry/texture_pt_HSIMAE-S_v2/params_final.msgpack"
NAMES = ["checker-p1", "checker-p2", "h-stripes-p2", "v-stripes-p2",
         "speckle", "checker-p3"]


def print_cm(cm: np.ndarray, title: str) -> None:
    print(f"\n{title} (rows=true, cols=pred, row-normalized %):")
    print(" " * 14 + "".join(f"{n[:9]:>10}" for n in NAMES))
    for i, row in enumerate(cm):
        frac = 100 * row / max(row.sum(), 1)
        print(f"{NAMES[i]:>13} " + "".join(f"{v:10.1f}" for v in frac))


def confusion(y_true: np.ndarray, y_pred: np.ndarray) -> np.ndarray:
    cm = np.zeros((6, 6), dtype=np.int64)
    for t, p in zip(y_true, y_pred):
        if 1 <= t <= 6 and 1 <= p <= 6:
            cm[t - 1, p - 1] += 1
    return cm


def oracle_confusion() -> None:
    from sklearn.linear_model import LogisticRegression

    scene_raw, gt = make_textured_scene(96, 96, bands=103, seed=3407,
                                        cells_per_class=2)
    scene = apply_gwpca(scene_raw, 32)
    feats = autocorr_features(scene)
    w = scene.shape[1]
    rng = np.random.default_rng(3407)
    train_idx, test_gt_flat = sample_per_class(gt.ravel(), 10, rng=rng)
    tr_r, tr_c = train_idx // w, train_idx % w
    mask = test_gt_flat > 0
    clf = LogisticRegression(max_iter=2000)
    clf.fit(feats[tr_r, tr_c], gt[tr_r, tr_c])
    pred = clf.predict(feats.reshape(-1, len(LAGS))[mask])
    yte = test_gt_flat[mask]
    print(f"oracle OA {100 * (pred == yte).mean():.2f}")
    print_cm(confusion(yte, pred), "oracle (autocorr+logreg)")


def model_confusion() -> None:
    scene_raw, gt = make_textured_scene(96, 96, bands=103, seed=3407,
                                        cells_per_class=2)
    cfg = preset("HSIMAE-S")  # f32 on CPU
    ft = FinetuneConfig(epochs=200, lr=5e-4)
    # _run_one reproduces the protocol's test run exactly (same split seed);
    # EvalConfig(save_confusion) is not a thing — recompute from the pred map
    from hsimae_tpu.data.sampling import dual_scene_split
    from hsimae_tpu.train.evaluate import classify_scene
    from hsimae_tpu.train.finetune import dual_branch_finetune

    rng = np.random.default_rng(3407)
    split = dual_scene_split(scene_raw, gt, patch_size=cfg.img_size, num=10,
                             gwpca=True, nc=cfg.bands, rng=rng)
    res = dual_branch_finetune(split, cfg, ft,
                               pretrained=load_params(CKPT), seed=3407)
    pred_map = classify_scene(split.scene, res.params, res.model_cfg,
                              res.num_classes, EvalConfig())
    mask = split.test_gt > 0
    yte, pred = split.test_gt[mask], pred_map[mask]
    print(f"model OA {100 * (pred == yte).mean():.2f} "
          f"(TPU protocol run at this (lr, seed): 78.04)")
    print_cm(confusion(yte, pred), "HSIMAE-S@v2 finetune (lr 5e-4, seed 3407)")


if __name__ == "__main__":
    oracle_confusion()
    model_confusion()
