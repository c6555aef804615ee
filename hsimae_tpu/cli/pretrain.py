"""MAE pretraining CLI — mirrors `/root/reference/Model_Pretraining.py:116-152`.

Example (synthetic corpus, tiny run):
    python -m hsimae_tpu.cli.pretrain --synthetic --epochs 2 --batch-size 64 \
        --model HSIMAE-S --workdir /tmp/pt
"""

from __future__ import annotations

import argparse

import numpy as np

from hsimae_tpu.cli.common import (
    add_model_args,
    load_pretrain_scenes,
    model_config,
)
from hsimae_tpu.config import PretrainConfig
from hsimae_tpu.data.gwpca import apply_gwpca
from hsimae_tpu.data.pipeline import MultiScenePatchSource
from hsimae_tpu.data.windows import build_pretrain_cut_index
from hsimae_tpu.train.pretrain import run_pretraining
from hsimae_tpu.utils.seed import seed_everything


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    p.add_argument("--scenes", nargs="*", default=None, help=".npy cubes")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-scenes", type=int, default=3)
    p.add_argument("--synthetic-size", type=int, default=64)
    p.add_argument("--synthetic-bands", type=int, default=103)
    p.add_argument("--synthetic-texture", action="store_true",
                   help="textured corpus (make_textured_pretrain_scenes)")
    p.add_argument("--synthetic-seed", type=int, default=None,
                   help="scene-generation seed; defaults to --seed "
                        "(decouple when comparing runs that must share a corpus)")
    p.add_argument("--no-gwpca", dest="gwpca", action="store_false", default=True)
    p.add_argument("--scene-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="resident scene-buffer dtype; bfloat16 halves HBM "
                   "residency + upload time for reference-scale corpora "
                   "(patches still normalize/train in f32/compute dtype)")
    # reference defaults (`Model_Pretraining.py:119-134`)
    p.add_argument("--mask-ratio", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--wd", type=float, default=5e-2)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--ratio", type=float, default=1.0,
                   help="subsample ratio for dense-cut scenes (`Preprocessing.py:105`)")
    p.add_argument("--coarse-from", type=int, default=14,
                   help="scene id from which cuts are non-overlapping (`:101-110`)")
    p.add_argument("--workdir", default=None)
    # preemption-safe default: a killed long pretrain resumes out of the box
    # (the reference saves only at the very end, `Model_Pretraining.py:111`)
    p.add_argument("--checkpoint-every", type=int, default=1000, dest="ckpt_every",
                   help="save a resumable checkpoint every N steps (0 = final only)")
    p.add_argument("--no-resume", dest="resume", action="store_false", default=True)
    p.add_argument("--ckpt-backend", choices=["msgpack", "orbax"],
                   default="msgpack",
                   help="orbax = async background saves + managed retention "
                   "(checkpoints/orbax_io.py); msgpack = one synchronous "
                   "self-contained file per checkpoint")
    p.add_argument("--ckpt-max-keep", type=int, default=3,
                   help="orbax backend: checkpoints retained on disk "
                   "(0 = keep all); ignored by msgpack, which keeps all")
    p.add_argument("--adam-mu-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="storage dtype of Adam's first moment "
                   "(bfloat16 = less optimizer-state HBM traffic)")
    p.add_argument("--fused-steps", type=int, default=0)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace of one steady epoch")
    return p


def main(argv=None):
    from hsimae_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    seed_everything(args.seed)

    scenes = load_pretrain_scenes(args)
    if args.gwpca:
        scenes = [apply_gwpca(s, nc=args.bands) for s in scenes]
    import jax.numpy as jnp

    source = MultiScenePatchSource(
        scenes, patch_size=args.img_size,
        storage_dtype=jnp.bfloat16 if args.scene_dtype == "bfloat16" else np.float32,
    )
    index = build_pretrain_cut_index(
        [s.shape for s in scenes], args.img_size,
        ratio=args.ratio, coarse_from=args.coarse_from,
        rng=np.random.default_rng(args.seed),
    )
    print(f"[pretrain] {len(scenes)} scenes, {len(index)} patches")

    cfg = PretrainConfig(
        mask_ratio=args.mask_ratio, lr=args.lr, weight_decay=args.wd,
        batch_size=args.batch_size, epochs=args.epochs, seed=args.seed,
        checkpoint_every_steps=args.ckpt_every, fused_steps=args.fused_steps,
        checkpoint_backend=args.ckpt_backend,
        ckpt_max_to_keep=args.ckpt_max_keep or None,
        adam_mu_dtype=(None if args.adam_mu_dtype == "float32"
                       else args.adam_mu_dtype),
    )
    params, hist = run_pretraining(
        source, index.locs, model_config(args), cfg,
        workdir=args.workdir, resume=args.resume, profile_dir=args.profile,
    )
    print(f"[pretrain] done; final epoch loss {hist['epoch_loss'][-1]:.4f}")
    return params


if __name__ == "__main__":
    main()
