"""Reference-scale HSIMAE protocol on the shared synthetic scene.

Reproduces the full `Model_Finetuning.py:304-429` experiment shape — for each
label budget in {5, 10, 15, 20} samples/class: lr grid x 3 selection seeds ->
best-lr x 5 test seeds x 200 epochs -> mean±std OA/AA/kappa + per-class —
using the MAE-pretrained HSIMAE-S checkpoint produced by
``scripts/pretrain_corpus.py`` (pass its params path as argv[1]).

Writes JSON results to /tmp/protocol_table.json and a markdown table to
stdout. Run on the TPU (one process; compiled steps are shared across all
17 runs per budget via the finetune step cache).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_session import ensure_fast_session  # noqa: E402

ensure_fast_session()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from hsimae_tpu.checkpoints.io import load_params  # noqa: E402
from hsimae_tpu.config import FinetuneConfig, ProtocolConfig, preset  # noqa: E402
from hsimae_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from hsimae_tpu.train.protocol import run_protocol  # noqa: E402
from hsimae_tpu.utils.seed import seed_everything  # noqa: E402


def main():
    pretrained_path = sys.argv[1] if len(sys.argv) > 1 else None
    pretrained = load_params(pretrained_path) if pretrained_path else None
    epochs = int(os.environ.get("HSIMAE_PROTO_EPOCHS", "200"))

    seed_everything(3407)
    scene, gt = make_synthetic_scene(64, 64, bands=103, n_classes=6, seed=3407)
    cfg = preset("HSIMAE-S", compute_dtype=jnp.bfloat16)
    ft = FinetuneConfig(epochs=epochs)
    proto = ProtocolConfig(selection_seeds=3, test_seeds=5)

    results = {}
    if os.path.exists("/tmp/protocol_table.json"):
        with open("/tmp/protocol_table.json") as f:
            results = {int(k): v for k, v in json.load(f).items()}
    for spc in (5, 10, 15, 20):
        if spc in results:
            print(f"== {spc}/class already done, skipping", flush=True)
            continue
        t0 = time.perf_counter()
        r = None
        for attempt in range(3):  # the tunnel's remote compile can drop
            try:
                r = run_protocol(scene, gt, cfg, ft, proto,
                                 samples_per_class=spc,
                                 pretrained=pretrained, gwpca=True)
                break
            except Exception as e:  # noqa: BLE001
                print(f"== {spc}/class attempt {attempt} failed: {e}",
                      flush=True)
        if r is None:
            continue
        results[spc] = {
            "best_lr": r.best_lr,
            "oa": f"{100 * r.oa_mean:.2f}±{100 * r.oa_std:.2f}",
            "aa": f"{100 * r.aa_mean:.2f}±{100 * r.aa_std:.2f}",
            "kappa": f"{100 * r.kappa_mean:.2f}±{100 * r.kappa_std:.2f}",
            "per_class": [round(100 * float(v), 2) for v in r.per_class_mean],
            "minutes": round((time.perf_counter() - t0) / 60, 1),
        }
        print(f"== {spc}/class: {results[spc]}", flush=True)
        with open("/tmp/protocol_table.json", "w") as f:
            json.dump(results, f, indent=2)

    print("\n| samples/class | best lr | OA | AA | kappa |")
    print("|---|---|---|---|---|")
    for spc, r in results.items():
        print(f"| {spc} | {r['best_lr']:g} | {r['oa']} | {r['aa']} | {r['kappa']} |")


if __name__ == "__main__":
    main()
