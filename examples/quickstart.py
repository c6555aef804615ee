"""End-to-end quickstart: pretrain -> fine-tune -> evaluate -> export.

Runs the full HSIMAE workflow on synthetic scenes (no datasets needed) at a
tiny budget so it finishes in a few minutes on CPU and in seconds on TPU.
Swap ``--synthetic`` for ``--scene your_cube.npy --gt your_gt.npy`` (and
raise the epochs to the reference defaults) for real work — the flags mirror
the reference drivers (`/root/reference/Model_Pretraining.py:119-134`,
`Model_Finetuning.py:305-329`).

    python examples/quickstart.py [workdir]
"""

import pathlib
import sys

# `python examples/quickstart.py` puts examples/ (the script dir) on
# sys.path, not the repo root — make the documented invocation work from
# anywhere without an installed package or PYTHONPATH
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main(workdir: str = "/tmp/hsimae_quickstart", *,
         scenes: int = 3, scene_size: int = 48,
         pt_epochs: int = 2, ft_epochs: int = 10) -> None:
    """The keyword budgets exist so the smoke test (tests/test_quickstart.py)
    can run this exact workflow at an even smaller size; the defaults are the
    documented few-minute CPU budget."""
    wd = pathlib.Path(workdir)

    from hsimae_tpu.cli import evaluate, export, finetune, pretrain

    # 1. MAE pretraining on a 3-scene synthetic corpus (GWPCA to 32 bands,
    #    dense step-3 cuts, spatial-spectral masking at ratio 0.5)
    pretrain.main([
        "--synthetic", "--synthetic-scenes", str(scenes),
        "--synthetic-size", str(scene_size),
        "--model", "HSIMAE-S", "--epochs", str(pt_epochs),
        "--batch-size", "256",
        "--workdir", str(wd / "pt"),
    ])

    # 2. Dual-branch fine-tuning: 10 labeled samples/class + the scene's
    #    unlabeled pool (CE on labels + 10x masked reconstruction)
    finetune.main([
        "--synthetic", "--samples-per-class", "10",
        "--epochs", str(ft_epochs),
        "--model", "HSIMAE-S",
        "--pretrained", str(wd / "pt" / "params_final.msgpack"),
        "--workdir", str(wd / "ft"),
    ])

    # 3. Full-scene per-pixel evaluation (test pixels only) + colormaps.
    #    --seed must match finetune's (default 3407) so the SAME synthetic
    #    scene is regenerated and the SAME train split is zeroed from the gt
    evaluate.main([
        "--synthetic", "--model", "HSIMAE-S",
        "--params", str(wd / "ft" / "finetuned.msgpack"),
        "--num-classes", "7", "--samples-per-class", "10", "--seed", "3407",
        "--out", str(wd / "maps"),
    ])

    # 4. Export a deployable artifact (static-batch StableHLO + params);
    #    int8 weight-only quantization shrinks it ~4x at <1% logits error
    export.main([
        "--model", "HSIMAE-S",
        "--params", str(wd / "ft" / "finetuned.msgpack"),
        "--num-classes", "7", "--batch-sizes", "1", "256",
        "--quantize", "int8",
        "--output", str(wd / "model.hsix"),
    ])

    # 5. Serve from the artifact — no flax / model source needed
    from hsimae_tpu.serving import load_classifier

    clf = load_classifier(str(wd / "model.hsix"))
    patches = np.random.default_rng(0).standard_normal(
        (5, 9, 9, 32)).astype(np.float32)
    labels = clf.predict(patches)
    print("served labels:", labels)

    # 6. Or run the whole-scene evaluation straight from the artifact
    evaluate.main([
        "--synthetic", "--artifact", str(wd / "model.hsix"),
        "--samples-per-class", "10", "--seed", "3407",
        "--out", str(wd / "maps_artifact"),
    ])
    return labels


if __name__ == "__main__":
    main(*sys.argv[1:2])
