"""Export a fine-tuned classifier as a self-contained serving artifact.

    python -m hsimae_tpu.cli.export --params /tmp/ft/finetuned.msgpack \
        --num-classes 7 --output /tmp/model.hsix --batch-sizes 1 64 1024

The artifact (StableHLO programs at fixed batch buckets + params + model
metadata, one msgpack file) is loaded with
``hsimae_tpu.serving.load_classifier`` and runs on CPU or TPU without the
model source — the deploy counterpart of the reference's "ship Models.py +
torch .pkl" flow (`/root/reference/Model_Finetuning.py:243-301`).
"""

from __future__ import annotations

import argparse
import json

from hsimae_tpu.cli.common import add_model_args, load_any_checkpoint, model_config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    add_model_args(p)
    p.add_argument("--params", required=True, help=".msgpack or torch .pkl")
    p.add_argument("--num-classes", type=int, required=True,
                   help="including background class 0")
    p.add_argument("--output", required=True, help="artifact path (.hsix)")
    p.add_argument("--batch-sizes", type=int, nargs="+",
                   default=[1, 64, 1024])
    p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    p.add_argument("--params-dtype", default=None,
                   help="cast float params before export (e.g. bfloat16 — "
                        "half the artifact/HBM size)")
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="weight-only int8 kernels (~4x smaller artifact; "
                        "dequantization baked into the exported program)")
    return p


def main(argv=None):
    from hsimae_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    from hsimae_tpu.serving.export import export_classifier, save_classifier

    params = load_any_checkpoint(args.params)
    blob = export_classifier(
        params, model_config(args), args.num_classes,
        batch_sizes=args.batch_sizes, platforms=args.platforms,
        params_dtype=args.params_dtype, quantize=args.quantize)
    path = save_classifier(args.output, blob)
    print(json.dumps({"artifact": path, "bytes": len(blob),
                      "batch_sizes": sorted(set(args.batch_sizes)),
                      "platforms": args.platforms,
                      "quantize": args.quantize}))


if __name__ == "__main__":
    main()
