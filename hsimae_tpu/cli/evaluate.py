"""Full-scene inference CLI — mirrors ``test_model``
(`/root/reference/Model_Finetuning.py:243-301`): load fine-tuned params into
an encoder-only HSIViT by key intersection, classify every pixel, report
OA/AA/kappa/per-class, and save prediction colormaps.

    python -m hsimae_tpu.cli.evaluate --synthetic --params /tmp/ft/finetuned.msgpack \
        --num-classes 7 --out /tmp/eval
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
from hsimae_tpu.config import EvalConfig
from hsimae_tpu.data.gwpca import apply_gwpca
from hsimae_tpu.train.evaluate import evaluate_scene


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    add_data_args(p, labeled=True)
    p.add_argument("--params", default=None, help=".msgpack or torch .pkl")
    p.add_argument("--artifact", default=None,
                   help="serving artifact (.hsix) to evaluate instead of "
                        "--params — full-scene eval without model source")
    p.add_argument("--num-classes", type=int, default=None,
                   help="including background class 0 (required with "
                        "--params; read from the artifact otherwise)")
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel inference over N devices (0 = single "
                        "device); batch is split over the mesh 'data' axis")
    p.add_argument("--out", default=None, help="dir for colormap PNGs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--samples-per-class", type=int, default=None,
                   help="reproduce the training split (same seed) and zero "
                        "its pixels from the gt so metrics are TEST metrics, "
                        "as the reference's test_model receives test_gt")
    p.add_argument("--test-gt", default=None,
                   help=".npy test gt (train pixels already zeroed)")
    return p


def main(argv=None):
    from hsimae_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    scene, gt = load_labeled_scene(args)
    mcfg = model_config(args)
    if args.gwpca:
        scene = apply_gwpca(scene, nc=mcfg.bands)
    if args.test_gt:
        gt = np.load(args.test_gt)
    elif args.samples_per_class:
        # reproduce the few-shot split deterministically and score only on
        # the held-out pixels (the reference's test_gt semantics)
        from hsimae_tpu.data.sampling import sample_per_class

        _, test_gt_flat = sample_per_class(
            gt.reshape(-1), num=args.samples_per_class,
            rng=np.random.default_rng(args.seed))
        gt = test_gt_flat.reshape(gt.shape)
    if (args.params is None) == (args.artifact is None):
        raise SystemExit("exactly one of --params / --artifact is required")
    if args.artifact:
        from hsimae_tpu.serving import load_classifier
        from hsimae_tpu.train.evaluate import evaluate_scene_artifact

        res = evaluate_scene_artifact(
            scene.astype(np.float32), gt, load_classifier(args.artifact),
            EvalConfig(batch_size=args.batch_size),
            save_dir=args.out, name="scene",
        )
    else:
        if args.num_classes is None:
            raise SystemExit("--num-classes is required with --params")
        params = load_any_checkpoint(args.params)
        mesh = None
        if args.dp:
            from hsimae_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(data=args.dp)
        res = evaluate_scene(
            scene.astype(np.float32), gt, params, mcfg, args.num_classes,
            EvalConfig(batch_size=args.batch_size),
            save_dir=args.out, name="scene", mesh=mesh,
        )
    m = res.metrics
    print(json.dumps({
        "oa": round(100 * m.oa, 2), "aa": round(100 * m.aa, 2),
        "kappa": round(100 * m.kappa, 2),
        "per_class": [round(100 * float(x), 2) for x in m.per_class],
    }))
    return res


if __name__ == "__main__":
    main()
