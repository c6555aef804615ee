"""A/B: encoder_lr_scale on the textured-benchmark finetune (CPU).

`diag_class6_probe.py` showed the v2-pretrained encoder's frozen latents
linearly separate the scene at 89.7 OA while the reference's uniform-lr
dual-branch finetune lands at 77.9 — the finetune recipe damages the
pretrained representation at 10 labels/class. This runs the SAME protocol
test run (lr 5e-4 unless overridden, seed 3407) at several
`FinetuneConfig.encoder_lr_scale` values and prints OA + per-class.

Run: JAX_PLATFORMS=cpu python scripts/diag_encoder_lr_ab.py [scales...]
(~17 min per scale on CPU; default scales: 0.0 0.05)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

# Default CPU; HSIMAE_AB_TPU=1 runs on the live device (each 200-epoch
# finetune is ~4 min there vs ~17 on CPU) — caller must hold the bench slot
# (main() does) so the fast-session hunter never shares the TPU.
if os.environ.get("HSIMAE_AB_TPU"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
else:
    jax.config.update("jax_platforms", "cpu")
    # concurrent diag instances MUST NOT share a persistent compile cache
    # (corruption aborts readers — see verify SKILL.md); override per instance
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("HSIMAE_DIAG_COMP_CACHE",
                                     "/tmp/jax_diag_comp_cache"))

import numpy as np  # noqa: E402

from hsimae_tpu.checkpoints.io import load_params  # noqa: E402
from hsimae_tpu.config import EvalConfig, FinetuneConfig, preset  # noqa: E402
from hsimae_tpu.data.sampling import dual_scene_split  # noqa: E402
from hsimae_tpu.data.synthetic import make_textured_scene  # noqa: E402
from hsimae_tpu.train.evaluate import evaluate_scene  # noqa: E402
from hsimae_tpu.train.finetune import dual_branch_finetune  # noqa: E402

CKPT = os.environ.get(
    "HSIMAE_AB_CKPT",
    "/root/repo/artifacts/round_carry/texture_pt_HSIMAE-S_v2/params_final.msgpack")
PRESET = os.environ.get("HSIMAE_AB_PRESET", "HSIMAE-S")
DECODER = tuple(int(x) for x in
                os.environ.get("HSIMAE_AB_DECODER", "").split(",") if x)
NAMES = ["checker-p1", "checker-p2", "h-stripes-p2", "v-stripes-p2",
         "speckle", "checker-p3"]
LR = float(os.environ.get("HSIMAE_AB_LR", "5e-4"))
SEED = int(os.environ.get("HSIMAE_AB_SEED", "3407"))
EPOCHS = int(os.environ.get("HSIMAE_AB_EPOCHS", "200"))
DROP_PATH = float(os.environ.get("HSIMAE_AB_DROPPATH", "0.2"))


def run(scale: float) -> None:
    scene_raw, gt = make_textured_scene(96, 96, bands=103, seed=3407,
                                        cells_per_class=2)
    cfg = preset(PRESET, **({"decoder_depth": DECODER[0],
                             "decoder_dim": DECODER[1]} if DECODER else {}))
    ft = FinetuneConfig(epochs=EPOCHS, lr=LR, encoder_lr_scale=scale,
                        drop_path=DROP_PATH)
    rng = np.random.default_rng(SEED)
    split = dual_scene_split(scene_raw, gt, patch_size=cfg.img_size, num=10,
                             gwpca=True, nc=cfg.bands, rng=rng)
    t0 = time.perf_counter()
    res = dual_branch_finetune(split, cfg, ft,
                               pretrained=load_params(CKPT), seed=SEED)
    ev = evaluate_scene(split.scene, split.test_gt, res.params,
                        res.model_cfg, res.num_classes,
                        EvalConfig(save_colormaps=False))
    m = ev.metrics
    per = " ".join(f"{n}={100 * p:.0f}"
                   for n, p in zip(NAMES, m.per_class))
    print(f"scale={scale:g} lr={LR:g} seed={SEED}: OA {100 * m.oa:.2f} "
          f"AA {100 * m.aa:.2f} kappa {100 * m.kappa:.2f} "
          f"({(time.perf_counter() - t0) / 60:.1f} min)\n  {per}",
          flush=True)


if __name__ == "__main__":
    scales = [float(a) for a in sys.argv[1:]] or [0.0, 0.05]
    print(f"(S@v2 baselines: scale=1.0 measured OA 77.88, checker-p3 25.1; "
          f"frozen linear probe OA 89.74)", flush=True)
    if os.environ.get("HSIMAE_AB_TPU"):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tpu_session import hold_bench_slot

        with hold_bench_slot():
            for s in scales:
                run(s)
    else:
        for s in scales:
            run(s)
