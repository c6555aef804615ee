"""Full comparison table: the 10-model zoo + SVM-RBF at registry budgets.

Reproduces the reference harness experiment (`Compared_Experiment.py:522-636`)
on the shared synthetic scene (same raw scene as scripts/protocol_table.py,
64x64, 103 bands, 6 classes, seed 3407): per model, lr grid
[1e-3, 5e-4, 1e-4, 5e-5] x 3 selection seeds -> best lr x 5 test seeds with
full-scene eval, at each model's registry epochs (200-1000, early stop where
the reference uses it). Run on the TPU; compiled steps are shared across the
17 runs of each model.

Results stream to /tmp/comparison_table.json (one model at a time, so an
interrupted run keeps its finished rows).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_session import ensure_fast_session  # noqa: E402

ensure_fast_session()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from hsimae_tpu.cli import benchmark as bench_cli  # noqa: E402

OUT = "/tmp/comparison_table.json"


def main():
    models = sys.argv[1:] or [
        "SSRN", "FDSSC", "DBDA", "SSFTT", "SpectralFormer",
        "HybridFormer", "GSC-ViT", "DCTN", "RSSAN", "HiT", "SVM-RBF",
    ]
    done = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            done = json.load(f)
    for name in models:
        if name in done:
            print(f"== {name}: already done, skipping", flush=True)
            continue
        t0 = time.perf_counter()
        rep = None
        for attempt in range(3):  # the tunnel's remote compile can drop
            try:
                rep = bench_cli.main([
                    "--synthetic", "--synthetic-size", "64",
                    "--synthetic-bands", "103", "--synthetic-classes", "6",
                    "--samples-per-class", "10", "--selection-seeds", "3",
                    "--test-seeds", "5", "--models", name,
                ])
                break
            except Exception as e:  # noqa: BLE001
                print(f"== {name} attempt {attempt} failed: {e}", flush=True)
        if rep is None:
            continue
        done[name] = {**rep[name],
                      "minutes": round((time.perf_counter() - t0) / 60, 1)}
        with open(OUT, "w") as f:
            json.dump(done, f, indent=2)
        print(f"== {name} done in {done[name]['minutes']} min", flush=True)

    print("\n| model | best lr | OA | AA | kappa |")
    print("|---|---|---|---|---|")
    for name, r in done.items():
        print(f"| {name} | {r.get('best_lr')} | {r['oa']} | {r['aa']} | {r['kappa']} |")


if __name__ == "__main__":
    main()
