"""Full comparison table: the 10-model zoo + SVM-RBF at registry budgets.

Reproduces the reference harness experiment (`Compared_Experiment.py:522-636`)
on a shared synthetic scene: per model, lr grid [1e-3, 5e-4, 1e-4, 5e-5] x 3
selection seeds -> best lr x 5 test seeds with full-scene eval, at each
model's registry epochs (200-1000, early stop where the reference uses it).
Compiled steps are shared across the 17 runs of each model.

Scenes:
  default      — the spectrally-separable scene (make_synthetic_scene,
                 64x64x103, 6 classes, seed 3407; round-2 table)
  --texture    — the joint spatial-spectral scene (make_textured_scene,
                 96x96, cells_per_class=2, seed 3407): per-pixel classifiers
                 are at chance, class identity lives in 9x9 texture
                 (VERDICT r03 item 3)

Device: runs on whatever jax finds; set HSIMAE_FORCE_CPU=1 to pin CPU (safe
alongside TPU work — accuracy numbers are device-independent).

Results stream one model at a time to the --out path (default
/tmp/comparison_table.json; texture default /tmp/comparison_table_texture
.json), so an interrupted run keeps its finished rows.
"""

import contextlib
import json
import os
import sys
import time

if os.environ.get("HSIMAE_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from hsimae_tpu.cli import benchmark as bench_cli  # noqa: E402


def main():
    argv = sys.argv[1:]
    texture = "--texture" in argv
    argv = [a for a in argv if a != "--texture"]
    out = "/tmp/comparison_table_texture.json" if texture \
        else "/tmp/comparison_table.json"
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    models = argv or [
        "SSRN", "FDSSC", "DBDA", "SSFTT", "SpectralFormer",
        "HybridFormer", "GSC-ViT", "DCTN", "RSSAN", "HiT", "SVM-RBF",
    ]
    done = {}
    if os.path.exists(out):
        with open(out) as f:
            done = json.load(f)
    if os.environ.get("HSIMAE_FORCE_CPU"):
        slot = contextlib.nullcontext()
    else:  # on the TPU: hold bench.py's single-slot flock for the whole table
        from tpu_session import hold_bench_slot

        slot = hold_bench_slot()
    with slot:
        _run_models(models, done, out, texture)


def _run_models(models, done, out, texture):
    for name in models:
        if name in done:
            print(f"== {name}: already done, skipping", flush=True)
            continue
        t0 = time.perf_counter()
        rep = None
        for attempt in range(3):  # the tunnel's remote compile can drop
            try:
                rep = bench_cli.main([
                    "--synthetic",
                    "--synthetic-size", "96" if texture else "64",
                    "--synthetic-bands", "103", "--synthetic-classes", "6",
                    "--samples-per-class", "10", "--selection-seeds", "3",
                    "--test-seeds", "5", "--models", name,
                ] + (["--synthetic-texture",
                      "--synthetic-cells-per-class", "2"] if texture else []))
                break
            except Exception as e:  # noqa: BLE001
                print(f"== {name} attempt {attempt} failed: {e}", flush=True)
        if rep is None:
            continue
        done[name] = {**rep[name],
                      "minutes": round((time.perf_counter() - t0) / 60, 1)}
        with open(out, "w") as f:
            json.dump(done, f, indent=2)
        print(f"== {name} done in {done[name]['minutes']} min", flush=True)

    print("\n| model | best lr | OA | AA | kappa |")
    print("|---|---|---|---|---|")
    for name, r in done.items():
        print(f"| {name} | {r.get('best_lr')} | {r['oa']} | {r['aa']} | {r['kappa']} |")


if __name__ == "__main__":
    main()
