"""Shared CLI plumbing: scene loading (real ``.npy`` cubes or synthetic),
model-preset selection, and checkpoint loading (native msgpack or torch pkl).

The reference has no CLI at all — every entry point is an ``if __name__``
block with hard-coded constants (`/root/reference/Model_Pretraining.py:116`,
`/root/reference/Model_Finetuning.py:304`). These argparse front-ends expose
the same knobs with the same defaults.
"""

from __future__ import annotations

import argparse
from typing import List, Optional, Tuple

import numpy as np

import os

from hsimae_tpu.config import ModelConfig, PRESETS, preset


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Persistent compile cache: on this TPU runtime a train-step compile
    costs 60-500s, so every CLI enables the cache up front.

    Precedence: explicit ``path`` argument > ``JAX_COMPILATION_CACHE_DIR``
    env var > the production default. The env override lets a harness that
    invokes CLI mains in-process (the test suite) redirect every CLI's cache
    to an isolated dir — sharing the live TPU job's cache dir between two
    processes aborts the reader (see tests/conftest.py).

    Also honors ``HSIMAE_PLATFORM`` (e.g. ``cpu``): some runtimes (the axon
    sitecustomize here) pin ``jax_platforms`` via jax.config, which silently
    overrides the ``JAX_PLATFORMS`` env var — without this hook a CLI run
    cannot fall back to CPU when the TPU tunnel is down."""
    import jax

    plat = os.environ.get("HSIMAE_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    if path is None:
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                              "/tmp/jax_comp_cache")
    if not path or path == "off":
        return  # some hosts abort reloading their own XLA:CPU AOT entries
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", default="HSIMAE-B", choices=sorted(PRESETS),
                   help="size preset [depth, dim, s_depth] per the reference")
    p.add_argument("--img-size", type=int, default=9)
    p.add_argument("--bands", type=int, default=32)
    p.add_argument("--patch-size", type=int, default=3)
    p.add_argument("--b-patch-size", type=int, default=8)
    p.add_argument("--bf16", action="store_true", default=True,
                   help="bf16 compute dtype (params stay f32)")
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--remat", action="store_true", default=False,
                   help="rematerialize transformer blocks in backward "
                   "(same numerics, less activation HBM traffic; helps on "
                   "bandwidth-bound sessions — ModelConfig.remat)")


def model_config(args) -> ModelConfig:
    import jax.numpy as jnp

    return preset(
        args.model,
        img_size=args.img_size,
        bands=args.bands,
        patch_size=args.patch_size,
        b_patch_size=args.b_patch_size,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        remat=getattr(args, "remat", False),
    )


def add_data_args(p: argparse.ArgumentParser, labeled: bool) -> None:
    p.add_argument("--scene", default=None, help=".npy [h, w, bands] cube")
    if labeled:
        p.add_argument("--gt", default=None, help=".npy [h, w] labels; 0=background")
    p.add_argument("--dataset", default=None,
                   help="named dataset (Salinas/PaviaU/Houston2013/LongKou) "
                        "under --data-root or $HSIMAE_DATA_ROOT")
    p.add_argument("--data-root", default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="use a generated scene (no dataset needed)")
    p.add_argument("--synthetic-size", type=int, default=64)
    p.add_argument("--synthetic-bands", type=int, default=103)
    p.add_argument("--synthetic-classes", type=int, default=6)
    p.add_argument("--synthetic-seed", type=int, default=None,
                   help="scene-generation seed; defaults to --seed. Set it "
                        "explicitly when chaining CLIs whose --seed defaults "
                        "differ (e.g. finetune then evaluate), so every step "
                        "sees the SAME generated scene")
    p.add_argument("--synthetic-texture", action="store_true",
                   help="textured scene family (make_textured_scene): class "
                        "identity lives only in joint spatial-spectral "
                        "structure — per-pixel classifiers are at chance")
    p.add_argument("--synthetic-cells-per-class", type=int, default=None,
                   help="textured scene: balanced Voronoi layout with this "
                        "many cells per class (few cells = large texture "
                        "regions; the shared benchmark uses 96x96 with 2)")
    p.add_argument("--no-gwpca", dest="gwpca", action="store_false", default=True)


def resolve_synthetic_seed(args) -> int:
    """--synthetic-seed when given, else --seed: scene generation follows
    the run seed unless explicitly decoupled (needed when chaining CLIs
    whose --seed defaults differ but that must see the SAME scene)."""
    seed = getattr(args, "synthetic_seed", None)
    if seed is None:
        seed = getattr(args, "seed", 0)
    return seed


def load_labeled_scene(args) -> Tuple[np.ndarray, np.ndarray]:
    if args.synthetic:
        from hsimae_tpu.data.synthetic import (
            make_synthetic_scene,
            make_textured_scene,
        )

        textured = getattr(args, "synthetic_texture", False)
        gen = make_textured_scene if textured else make_synthetic_scene
        seed = resolve_synthetic_seed(args)
        kw = {}
        if textured:
            cpc = getattr(args, "synthetic_cells_per_class", None)
            if cpc is not None:
                kw["cells_per_class"] = cpc
        return gen(
            args.synthetic_size, args.synthetic_size,
            bands=args.synthetic_bands, n_classes=args.synthetic_classes,
            seed=seed, **kw,
        )
    if getattr(args, "dataset", None):
        from hsimae_tpu.data.datasets import load_dataset

        return load_dataset(args.dataset, getattr(args, "data_root", None))
    if not args.scene or not getattr(args, "gt", None):
        raise SystemExit("need --scene and --gt, --dataset, or --synthetic")
    return np.load(args.scene), np.load(args.gt)


def load_pretrain_scenes(args) -> List[np.ndarray]:
    if args.synthetic:
        from hsimae_tpu.data.synthetic import (
            make_synthetic_pretrain_scenes,
            make_textured_pretrain_scenes,
        )

        textured = getattr(args, "synthetic_texture", False)
        gen = (make_textured_pretrain_scenes if textured
               else make_synthetic_pretrain_scenes)
        seed = resolve_synthetic_seed(args)
        kw = {}
        if textured:
            cpc = getattr(args, "synthetic_cells_per_class", None)
            if cpc is not None:
                kw["cells_per_class"] = cpc
        return gen(
            n_scenes=args.synthetic_scenes,
            size_range=(args.synthetic_size // 2, args.synthetic_size),
            bands=args.synthetic_bands,
            seed=seed, **kw,
        )
    if not args.scenes:
        raise SystemExit("need --scenes *.npy, or --synthetic")
    return [np.load(p) for p in args.scenes]


def load_any_checkpoint(path: Optional[str]) -> Optional[dict]:
    """msgpack (native) or torch .pkl/.pth (published HF checkpoints)."""
    if not path:
        return None
    if path.endswith((".pkl", ".pth", ".pt", ".bin")):
        from hsimae_tpu.checkpoints.torch_convert import load_torch_checkpoint

        return load_torch_checkpoint(path)
    from hsimae_tpu.checkpoints.io import load_params

    return load_params(path)
