"""Decompose the 'throttled session' step time: gather vs train step vs
host->device index upload, all in ONE process with value-fetch barriers.

Motivation: a process timing ONLY the (cached) train step on a resident
batch measured <50 ms/step while every gather+step loop today measured
~190 ms/step. If the slow part is the gather (the random-access read over
the scene buffer), not the step, the throttled floor can be attacked
algorithmically (bf16 gather traffic, batched gathers) rather than waiting
out the session lottery.

Timed variants (each: 4 warmup calls, then best of 3 x 8-call windows):
  1. step-only         — resident [2048, 9, 9, 32] batch, no gather
  2. gather-only       — resident locs (no host upload), no step
  3. gather-only bf16  — same, scene buffer stored bf16 (half the traffic)
  4. upload-only       — ship the [2048, 3] int32 locs batch, no compute
  5. gather+step       — the bench's one_step composition
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, warm=4, windows=3, n=8):
    for _ in range(warm):
        fn()
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    from hsimae_tpu.config import preset
    from hsimae_tpu.data.pipeline import MultiScenePatchSource
    from hsimae_tpu.data.windows import build_pretrain_cut_index
    from hsimae_tpu.models.hsimae import build_hsimae, init_model
    from hsimae_tpu.models.masking import grid_shape_candidates
    from hsimae_tpu.train.optim import pretrain_optimizer
    from hsimae_tpu.train.pretrain import TrainState, make_pretrain_step

    cfg = preset("HSIMAE-B", compute_dtype=jnp.bfloat16)
    bs = 2048
    scenes = [np.random.default_rng(i).standard_normal(
        (128, 128, cfg.bands)).astype(np.float32) for i in range(4)]
    src32 = MultiScenePatchSource(scenes, patch_size=cfg.img_size)
    src16 = MultiScenePatchSource(scenes, patch_size=cfg.img_size,
                                  storage_dtype=jnp.bfloat16)
    locs_np = build_pretrain_cut_index(
        [s.shape for s in scenes], cfg.img_size, coarse_from=2
    ).locs
    rng_np = np.random.default_rng(0)
    sel = rng_np.integers(0, len(locs_np), bs)
    locs_dev = jnp.asarray(locs_np[sel])  # resident index batch

    model = build_hsimae(cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.device_get(init_model(model, seed=0)["params"])
    params = jax.device_put(params, jax.devices()[0])
    tx, _ = pretrain_optimizer(5e-4, 5e-2, total_steps=1000)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_pretrain_step(model)
    lt, ll = grid_shape_candidates(cfg.t_size, cfg.l_size, 0.5)[0]
    key = jax.random.PRNGKey(0)
    imgs_res = jax.device_put(rng_np.standard_normal(
        (bs, cfg.img_size, cfg.img_size, cfg.bands)).astype(np.float32))

    st = [state]

    def step_only():
        st[0], loss = step(st[0], imgs_res, key, lt, ll)
        return float(loss)

    def gather_only():
        return float(src32.gather(locs_dev)[0, 0, 0, 0])

    def gather_bf16():
        return float(src16.gather(locs_dev)[0, 0, 0, 0])

    def upload_only():
        s = rng_np.integers(0, len(locs_np), bs)
        return float(jnp.asarray(locs_np[s])[0, 0])

    def gather_step():
        s = rng_np.integers(0, len(locs_np), bs)
        imgs = src32.gather(locs_np[s])
        st[0], loss = step(st[0], imgs, key, lt, ll)
        return float(loss)

    for tag, fn in [("step-only (resident batch)", step_only),
                    ("gather-only f32 (resident locs)", gather_only),
                    ("gather-only bf16 (resident locs)", gather_bf16),
                    ("upload-only ([2048,3] int32)", upload_only),
                    ("gather+step (bench one_step)", gather_step)]:
        dt = timeit(fn)
        print(f"{tag}: {dt*1e3:.1f} ms  ({bs/dt:,.0f} patches/s)", flush=True)


if __name__ == "__main__":
    main()
