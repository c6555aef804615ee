"""Same-session A/B: HBM byte cuts for the HSIMAE-B train step.

VERDICT r03 item 2: under the throttled session mode the step is
bandwidth-bound (linear-in-batch step time, near-peak MXU on big matmuls —
scripts/diag_throttle.py), so the controllable lever is bytes/step. Variants:

  base        — round-3 production step (bf16 compute, f32 params/adam)
  remat       — ModelConfig.remat: block activations recomputed in backward
  remat+mu16  — remat + Adam first moment stored in bf16

All variants run in ONE process (the session mode is a per-process draw, so
only same-process comparisons are valid — RESULTS.md round 2). Resident
batch, no gather: isolates the model step. Value-fetch barriers; >=4 warmup
calls per program (every program compiles twice on this runtime).

Run with the TPU slot held (python bench.py --hold &) or the fast-session
hunter paused (touch /tmp/hsimae_hunt_pause).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from hsimae_tpu.config import preset
from hsimae_tpu.models.hsimae import build_hsimae, init_model
from hsimae_tpu.models.masking import grid_shape_candidates
from hsimae_tpu.train.optim import pretrain_optimizer
from hsimae_tpu.train.pretrain import TrainState, make_pretrain_step

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
WARMUP = 5
STEPS = 10
WINDOWS = 2


def build(remat: bool, mu_dtype):
    cfg = preset("HSIMAE-B", compute_dtype=jnp.bfloat16, remat=remat)
    model = build_hsimae(cfg)
    if jax.devices()[0].platform != "cpu":
        with jax.default_device(jax.devices("cpu")[0]):
            params = jax.device_get(init_model(model, seed=0)["params"])
        params = jax.device_put(params, jax.devices()[0])
    else:
        params = init_model(model, seed=0)["params"]
    tx, _ = pretrain_optimizer(5e-4, 5e-2, total_steps=10_000,
                               mu_dtype=mu_dtype)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    return cfg, model, state


def measure(name: str, remat: bool, mu_dtype) -> float:
    cfg, model, state = build(remat, mu_dtype)
    step = make_pretrain_step(model)
    lt, ll = grid_shape_candidates(cfg.t_size, cfg.l_size, 0.5)[0]
    imgs = jax.device_put(np.random.default_rng(0).standard_normal(
        (BATCH, cfg.img_size, cfg.img_size, cfg.bands)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for i in range(WARMUP):
        state, loss = step(state, imgs, jax.random.fold_in(key, i), lt, ll)
        float(loss)  # value fetch = the only true barrier on this runtime
    print(f"# {name}: warmup {time.perf_counter() - t0:.1f}s "
          f"loss={float(loss):.4f}", file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, loss = step(state, imgs, jax.random.fold_in(key, 100 + i),
                               lt, ll)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    ms = best * 1e3
    print(f"# {name}: {ms:.2f} ms/step  {BATCH / best:,.0f} patches/s",
          file=sys.stderr, flush=True)
    return ms


def main():
    results = {}
    variants = [
        ("base", False, None),
        ("remat", True, None),
        ("remat+mu16", True, jnp.bfloat16),
        ("mu16", False, jnp.bfloat16),
    ]
    for name, remat, mu in variants:
        results[name] = round(measure(name, remat, mu), 2)
    mode = "throttled" if results["base"] > 50.0 else "fast"
    out = {"batch": BATCH, "session_mode": mode, "ms_per_step": results,
           "patches_per_sec": {k: round(BATCH / (v / 1e3), 1)
                               for k, v in results.items()}}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
