"""Probe the TPU chip's REAL usable HBM (memory_stats() returns zeros on the
axon backend): allocate 1-GiB device buffers one at a time, touching each via
a reduction (value fetch = true barrier), until allocation fails.

Then, with N GiB held resident, run one HSIMAE-B bs=2048 train step to find
the largest scene buffer the reference-scale pretrain can coexist with.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

GIB = 1 << 30


def main():
    held = []
    total = 0
    for i in range(16):
        try:
            buf = jax.device_put(jnp.zeros(GIB // 4, jnp.float32))
            float(buf[-1])  # force materialization
            held.append(buf)
            total += 1
            print(f"# held {total} GiB", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"alloc failed at +1 GiB (held {total} GiB): "
                  f"{type(e).__name__}", flush=True)
            break
    print(f"USABLE_HBM_GIB ~= {total}", flush=True)

    # release down to a scene-buffer-sized residue and try a real train step
    for keep_gib in range(total - 1, -1, -1):
        del held[keep_gib:]
        try:
            ok = _try_step()
        except Exception as e:  # noqa: BLE001
            print(f"step with {keep_gib} GiB resident: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            ok = False
        if ok:
            print(f"STEP_OK_WITH_RESIDENT_GIB = {keep_gib}", flush=True)
            break


_STEP = {}


def _try_step() -> bool:
    import jax.random as jrandom

    from hsimae_tpu.config import PretrainConfig, preset
    from hsimae_tpu.models.hsimae import build_hsimae, init_model
    from hsimae_tpu.models.masking import grid_shape_candidates
    from hsimae_tpu.train.optim import pretrain_optimizer
    from hsimae_tpu.train.pretrain import TrainState, make_pretrain_step

    if not _STEP:
        cfg = preset("HSIMAE-B", compute_dtype=jnp.bfloat16)
        model = build_hsimae(cfg)
        with jax.default_device(jax.devices("cpu")[0]):
            params = jax.device_get(init_model(model, seed=0)["params"])
        _STEP["cfg"] = cfg
        _STEP["model"] = model
        _STEP["host_params"] = params
        _STEP["step"] = make_pretrain_step(model)
        _STEP["lt_ll"] = grid_shape_candidates(cfg.t_size, cfg.l_size, 0.5)[0]
    cfg = _STEP["cfg"]
    params = jax.device_put(_STEP["host_params"], jax.devices()[0])
    tx, _ = pretrain_optimizer(5e-4, 5e-2, total_steps=1000)
    state = TrainState.create(apply_fn=_STEP["model"].apply, params=params,
                              tx=tx)
    imgs = jax.device_put(
        np.random.default_rng(0)
        .standard_normal((2048, cfg.img_size, cfg.img_size, cfg.bands))
        .astype(np.float32))
    lt, ll = _STEP["lt_ll"]
    t0 = time.perf_counter()
    for i in range(3):  # two compiles + one steady call (donation!)
        state, loss = _STEP["step"](state, imgs, jrandom.PRNGKey(i), lt, ll)
        float(loss)
    print(f"# step ok ({time.perf_counter()-t0:.1f}s for 3 calls)", flush=True)
    del state
    return True


if __name__ == "__main__":
    main()
