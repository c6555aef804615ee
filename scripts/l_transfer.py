"""HSIMAE-L end-to-end transfer (VERDICT r03 item 4, final leg).

From the 4M-patch refscale HSIMAE-L pretrain checkpoint
(`HSIMAE_REFSCALE_MODEL=HSIMAE-L scripts/pretrain_reference_scale.py train`),
run the round-3 flagship-transfer experiment at the Large tuple: dual-branch
finetune (reference defaults: 200 epochs, lr 1e-3, lambda=10, mask 0.8,
seed 3407, 10 samples/class) on a synthetic labeled scene of the SAME family
as the pretrain corpus, against the identical run from scratch, full-scene
eval for both. Holds the bench slot.

Usage: python scripts/l_transfer.py [ckpt] (default
/tmp/refscale/pt_l/params_final.msgpack)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")

from tpu_session import hold_bench_slot  # noqa: E402

if os.environ.get("HSIMAE_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from hsimae_tpu.checkpoints.io import load_params  # noqa: E402
from hsimae_tpu.config import EvalConfig, FinetuneConfig, preset  # noqa: E402
from hsimae_tpu.data.sampling import dual_scene_split  # noqa: E402
from hsimae_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from hsimae_tpu.train.evaluate import evaluate_scene  # noqa: E402
from hsimae_tpu.train.finetune import dual_branch_finetune  # noqa: E402
from hsimae_tpu.utils.seed import seed_everything  # noqa: E402

CKPT = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/refscale/pt_l/params_final.msgpack"
SEED = 3407
EPOCHS = int(os.environ.get("HSIMAE_LT_EPOCHS", "200"))


def run(init_params, tag, cfg, split):
    t0 = time.perf_counter()
    res = dual_branch_finetune(
        split, cfg, FinetuneConfig(epochs=EPOCHS), pretrained=init_params,
        seed=SEED)
    ev = evaluate_scene(split.scene, split.test_gt, res.params,
                        res.model_cfg, res.num_classes, EvalConfig())
    m = ev.metrics
    out = {"init": tag, "val_oa": round(100 * res.val_metrics.oa, 2),
           "test_oa": round(100 * m.oa, 2), "aa": round(100 * m.aa, 2),
           "kappa": round(100 * m.kappa, 2),
           "minutes": round((time.perf_counter() - t0) / 60, 1)}
    print(json.dumps(out), flush=True)
    return out


def main():
    with hold_bench_slot():
        seed_everything(SEED)
        scene_raw, gt = make_synthetic_scene(64, 64, bands=103, n_classes=6,
                                             seed=SEED)
        cfg = preset("HSIMAE-L", compute_dtype=jnp.bfloat16)
        split = dual_scene_split(scene_raw, gt, patch_size=cfg.img_size,
                                 num=10, gwpca=True, nc=cfg.bands,
                                 rng=np.random.default_rng(SEED))
        rows = [run(load_params(CKPT), "4M-patch L pretrain", cfg, split),
                run(None, "scratch", cfg, split)]
        with open("/tmp/l_transfer.json", "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
