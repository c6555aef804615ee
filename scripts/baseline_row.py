"""One suffixed baseline row for the textured-scene table (VERDICT r04 item 3).

Wraps `hsimae_tpu.cli.benchmark` for a single zoo model with a non-default
test-seed count and/or a held-out scene seed, and merges the result into the
shared table json under a suffixed key (e.g. ``DBDA@10ts``, ``DBDA@sc7701``)
so statistical extensions coexist with the original 5-seed rows.

Usage:
  python scripts/baseline_row.py DBDA --test-seeds 10
  python scripts/baseline_row.py DBDA --scene-seed 7701
Env: HSIMAE_BR_DONEFILE — queue retry sentinel (written on success).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/repo")

from tpu_session import hold_bench_slot  # noqa: E402

if os.environ.get("HSIMAE_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hsimae_tpu.cli import benchmark as bench_cli  # noqa: E402

OUT = "/tmp/comparison_table_texture.json"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--test-seeds", type=int, default=5)
    ap.add_argument("--scene-seed", type=int, default=None)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()

    key = args.model \
        + (f"@{args.test_seeds}ts" if args.test_seeds != 5 else "") \
        + (f"@sc{args.scene_seed}" if args.scene_seed is not None else "")
    done = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            done = json.load(f)
    if key in done:
        print(f"== {key}: already done, skipping", flush=True)
    else:
        cli_args = [
            "--synthetic", "--synthetic-size", "96",
            "--synthetic-bands", "103", "--synthetic-classes", "6",
            "--synthetic-texture", "--synthetic-cells-per-class", "2",
            "--samples-per-class", "10", "--selection-seeds", "3",
            "--test-seeds", str(args.test_seeds), "--models", args.model,
        ]
        if args.scene_seed is not None:
            cli_args += ["--scene-seed", str(args.scene_seed)]
        t0 = time.perf_counter()
        with hold_bench_slot():
            rep = bench_cli.main(cli_args)
        done[key] = {**rep[args.model],
                     "minutes": round((time.perf_counter() - t0) / 60, 1),
                     **({"scene_seed": args.scene_seed}
                        if args.scene_seed is not None else {}),
                     "test_seeds": args.test_seeds}
        with open(args.out, "w") as f:
            json.dump(done, f, indent=2)
        print(f"== {key}: {done[key]}", flush=True)

    donefile = os.environ.get("HSIMAE_BR_DONEFILE")
    if donefile:
        with open(donefile, "w") as f:
            json.dump({key: done[key]}, f)


if __name__ == "__main__":
    main()
