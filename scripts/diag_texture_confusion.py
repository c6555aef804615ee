"""Where does HSIMAE lose the texture benchmark? (round-4 diagnostic, CPU)

The 10/class texture-table per-class accuracies put classes 5 (iid speckle)
and 6 (period-3 checkerboard) at the bottom (0.60-0.79 / 0.34-0.52) while
DBDA reaches 87 OA overall. Two questions this script answers without
touching the TPU slot:

  1. WHICH classes are confused — full 6x6 confusion matrix of a finetune
     from the 600-epoch texture checkpoint (best protocol setting: lr 1e-3).
  2. Is the gap a LABEL problem or a FEATURE problem — the same finetune at
     50 samples/class. If 50 labels closes the gap, the encoder features
     separate the classes and more labels/pretraining help; if not, the
     [3x3-pixel-token] encoder cannot express the distinction and corpus
     scaling will not fix it.

Usage: JAX_PLATFORMS=cpu python scripts/diag_texture_confusion.py [ckpt]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from hsimae_tpu.checkpoints.io import load_params  # noqa: E402
from hsimae_tpu.config import EvalConfig, FinetuneConfig, preset  # noqa: E402
from hsimae_tpu.data.sampling import dual_scene_split  # noqa: E402
from hsimae_tpu.data.synthetic import make_textured_scene  # noqa: E402
from hsimae_tpu.train.evaluate import evaluate_scene  # noqa: E402
from hsimae_tpu.train.finetune import dual_branch_finetune  # noqa: E402
from hsimae_tpu.utils.seed import seed_everything  # noqa: E402

CKPT = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/texture_pt_HSIMAE-S/params_final.msgpack"
CLASS_NAMES = ["checker-p1", "checker-p2", "h-stripes-p2", "v-stripes-p2",
               "speckle", "checker-p3"]


def run(spc: int, seed: int = 3408) -> dict:
    seed_everything(seed)
    scene_raw, gt = make_textured_scene(96, 96, bands=103, seed=3407,
                                        cells_per_class=2)
    cfg = preset("HSIMAE-S", compute_dtype=jnp.bfloat16)
    split = dual_scene_split(scene_raw, gt, patch_size=cfg.img_size, num=spc,
                             gwpca=True, nc=cfg.bands,
                             rng=np.random.default_rng(seed))
    t0 = time.perf_counter()
    res = dual_branch_finetune(split, cfg, FinetuneConfig(epochs=200, lr=1e-3),
                               pretrained=load_params(CKPT), seed=seed)
    ev = evaluate_scene(split.scene, split.test_gt, res.params, res.model_cfg,
                        res.num_classes, EvalConfig(save_colormaps=False))
    mask = split.test_gt != 0
    t, p = split.test_gt[mask], ev.pred_map[mask]
    n = int(split.test_gt.max())
    conf = np.zeros((n, n), np.int64)
    np.add.at(conf, (t - 1, p - 1), 1)
    m = ev.metrics
    out = {"spc": spc, "oa": round(100 * m.oa, 2), "aa": round(100 * m.aa, 2),
           "kappa": round(100 * m.kappa, 2),
           "minutes": round((time.perf_counter() - t0) / 60, 1)}
    print(json.dumps(out), flush=True)
    print("rows=true, cols=pred (" + ", ".join(
        f"{i + 1}={c}" for i, c in enumerate(CLASS_NAMES)) + ")")
    rowsum = conf.sum(1, keepdims=True)
    for i in range(n):
        frac = conf[i] / max(rowsum[i, 0], 1)
        print(f"  {CLASS_NAMES[i]:>13}: " +
              " ".join(f"{x:5.2f}" for x in frac), flush=True)
    return out


if __name__ == "__main__":
    for spc in (10, 50):
        run(spc)
