"""Characterize the throttled session mode: latency floor vs slowed clock.

Round 2 established that a 16-step fused scan runs at the same per-step rate
as the eager loop — ruling out *dispatch* overhead. Two hypotheses remain:

  (a) slowed device clock: per-step time scales with compute, so batch 4096
      takes ~2x the batch-2048 step time (patches/s unchanged);
  (b) fixed per-program latency floor: per-step time is ~constant ~190 ms,
      so batch 4096 doubles patches/s.

Discriminators, all with value-fetch barriers:
  1. big matmul (4096^3, 137 GFLOP): ~0.7 ms at the 197 TFLOPs peak. Its
     measured time bounds the device clock directly.
  2. the real HSIMAE-B train step at batch 1024 / 2048 / 4096.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, n=6, warm=3):
    for _ in range(warm):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    # 1. device clock probe: one big matmul, FLOPs known exactly
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda x: (x @ x).sum())
    dt = timeit(lambda: float(mm(a)))
    tflops = 2 * 4096**3 / dt / 1e12
    print(f"matmul4096: {dt*1e3:.1f} ms -> {tflops:.1f} TFLOPs "
          f"({tflops/197*100:.0f}% of peak)", flush=True)

    # chained matmuls in one program: separates per-program floor from
    # per-op compute (8 matmuls ~ 1.1 TFLOP)
    def chain(x):
        for _ in range(8):
            x = x @ x / 64.0
        return x.sum()

    mm8 = jax.jit(chain)
    dt8 = timeit(lambda: float(mm8(a)))
    print(f"matmul4096 x8 in one program: {dt8*1e3:.1f} ms "
          f"({dt8/dt:.1f}x the single)", flush=True)

    # 2. real train step at three batch sizes
    from hsimae_tpu.config import PretrainConfig, preset
    from hsimae_tpu.data.pipeline import MultiScenePatchSource
    from hsimae_tpu.data.windows import build_pretrain_cut_index
    from hsimae_tpu.models.hsimae import build_hsimae, init_model
    from hsimae_tpu.models.masking import grid_shape_candidates
    from hsimae_tpu.train.optim import pretrain_optimizer
    from hsimae_tpu.train.pretrain import TrainState, make_pretrain_step

    cfg = preset("HSIMAE-B", compute_dtype=jnp.bfloat16)
    model = build_hsimae(cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        host_params = jax.device_get(init_model(model, seed=0)["params"])
    scenes = [np.random.default_rng(i).standard_normal(
        (128, 128, cfg.bands)).astype(np.float32) for i in range(4)]
    source = MultiScenePatchSource(scenes, patch_size=cfg.img_size)
    locs = build_pretrain_cut_index([s.shape for s in scenes], cfg.img_size,
                                    coarse_from=2).locs
    lt, ll = grid_shape_candidates(cfg.t_size, cfg.l_size, 0.5)[0]
    step = make_pretrain_step(model)
    rng_np = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    for bs in (1024, 2048, 4096):
        params = jax.device_put(host_params, jax.devices()[0])
        tx, _ = pretrain_optimizer(5e-4, 5e-2, total_steps=1000)
        state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

        def one(state=None, _s=[state], _bs=bs):
            sel = rng_np.integers(0, len(locs), _bs)
            imgs = source.gather(locs[sel])
            _s[0], loss = step(_s[0], imgs, key, lt, ll)
            return float(loss)

        dt = timeit(one, n=8, warm=4)
        print(f"train step bs={bs}: {dt*1e3:.1f} ms/step -> "
              f"{bs/dt:,.0f} patches/s", flush=True)


if __name__ == "__main__":
    main()
