"""Dual-branch fine-tuning CLI — mirrors `/root/reference/Model_Finetuning.py:304-447`.

Single run:
    python -m hsimae_tpu.cli.finetune --synthetic --samples-per-class 10 \
        --epochs 20 --model HSIMAE-S --eval --workdir /tmp/ft

Full multi-seed protocol (lr grid selection + 5-seed test):
    python -m hsimae_tpu.cli.finetune --synthetic --protocol
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from hsimae_tpu.cli.common import (
    add_data_args,
    add_model_args,
    load_any_checkpoint,
    load_labeled_scene,
    model_config,
)
from hsimae_tpu.config import EvalConfig, FinetuneConfig, ProtocolConfig
from hsimae_tpu.data.sampling import dual_scene_split
from hsimae_tpu.train.evaluate import evaluate_scene
from hsimae_tpu.train.finetune import dual_branch_finetune
from hsimae_tpu.train.protocol import run_protocol
from hsimae_tpu.utils.seed import seed_everything


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    add_data_args(p, labeled=True)
    p.add_argument("--pretrained", default=None,
                   help="pretrained params: .msgpack (native) or torch .pkl (HF)")
    p.add_argument("--samples-per-class", type=int, default=10)
    # reference defaults (`Model_Finetuning.py:304-329`)
    p.add_argument("--mask-ratio", type=float, default=0.8)
    p.add_argument("--lamda", type=float, default=10.0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--wd", type=float, default=5e-3)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--drop-path", type=float, default=0.2)
    p.add_argument("--encoder-lr-scale", type=float, default=1.0,
                   help="lr multiplier for non-head params; 1.0 = reference "
                        "recipe, 0.0 = frozen encoder (linear-probe head)")
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("--eval", action="store_true", help="full-scene test after training")
    p.add_argument("--eval-every", type=int, default=1)
    p.add_argument("--protocol", action="store_true",
                   help="run the full lr-grid x multi-seed protocol")
    p.add_argument("--lr-grid", nargs="+", type=float,
                   default=list(ProtocolConfig().lr_grid))
    p.add_argument("--selection-seeds", type=int,
                   default=ProtocolConfig().selection_seeds)
    p.add_argument("--test-seeds", type=int, default=ProtocolConfig().test_seeds)
    p.add_argument("--workdir", default=None)
    return p


def main(argv=None):
    from hsimae_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    seed_everything(args.seed)
    scene, gt = load_labeled_scene(args)
    mcfg = model_config(args)
    ft = FinetuneConfig(
        mask_ratio=args.mask_ratio, lamda=args.lamda, lr=args.lr,
        weight_decay=args.wd, batch_size=args.batch_size, epochs=args.epochs,
        drop_path=args.drop_path, seed=args.seed,
        encoder_lr_scale=args.encoder_lr_scale,
    )
    pretrained = load_any_checkpoint(args.pretrained)

    if args.protocol:
        proto = ProtocolConfig(
            lr_grid=tuple(args.lr_grid),
            selection_seeds=args.selection_seeds,
            test_seeds=args.test_seeds,
        )
        res = run_protocol(
            scene, gt, mcfg, ft,
            proto, EvalConfig(),
            samples_per_class=args.samples_per_class,
            pretrained=pretrained, gwpca=args.gwpca,
            resume_dir=args.workdir,  # completed (lr, seed) runs persist and
            # are skipped on restart (protocol_runs.jsonl)
        )
        print(json.dumps({
            "best_lr": res.best_lr,
            "oa": f"{100*res.oa_mean:.2f}±{100*res.oa_std:.2f}",
            "aa": f"{100*res.aa_mean:.2f}±{100*res.aa_std:.2f}",
            "kappa": f"{100*res.kappa_mean:.2f}±{100*res.kappa_std:.2f}",
            "per_class": [round(100 * float(x), 2) for x in res.per_class_mean],
        }))
        return res

    split = dual_scene_split(
        scene, gt, patch_size=mcfg.img_size, num=args.samples_per_class,
        gwpca=args.gwpca, nc=mcfg.bands, rng=np.random.default_rng(args.seed),
    )
    res = dual_branch_finetune(
        split, mcfg, ft, pretrained=pretrained,
        workdir=args.workdir, eval_every=args.eval_every,
    )
    print(f"[finetune] val: {res.val_metrics}")
    if args.eval:
        ev = evaluate_scene(
            split.scene, split.test_gt, res.params, res.model_cfg,
            res.num_classes, EvalConfig(), save_dir=args.workdir,
        )
        print(f"[finetune] test: {ev.metrics}")
        print(f"[finetune] per-class: {[f'{100*x:.1f}' for x in ev.metrics.per_class]}")
    return res


if __name__ == "__main__":
    main()
