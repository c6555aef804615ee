"""Speed-of-light audit: is the train step at the device's available speed?

The session lottery caps what the device gives us (RESULTS.md round 3/4),
but "are WE leaving anything on the table" is measurable: benchmark the
device's own primitives in THIS session (elementwise-copy bandwidth at
several sizes, big-matmul rate), model the HSIMAE-B train step's minimum
cost from its actual bytes+flops, and compare to the measured step time.
step/model ~= 1 means the program runs at the device's speed of light for
this session mode and the remaining gap to the roofline is environmental.

Same-process methodology as diag_bytes_ab.py (one mode draw, value-fetch
barriers, warm programs). Run with the slot held / hunter paused.
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

BATCH = 2048


def _time(f, *args, warmup=4, iters=8):
    for _ in range(warmup):
        r = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    # value-fetch barrier: block_until_ready returns early on this runtime
    float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def bandwidth_curve():
    """Elementwise x*1.0001+0.1 (read+write) GB/s at several sizes, bf16."""
    out = {}
    for mb in (8, 32, 128, 512):
        n = mb * 2**20 // 2  # bf16 elements
        x = jnp.ones((n,), jnp.bfloat16)
        f = jax.jit(lambda x: x * 1.0001 + 0.1)
        dt = _time(f, x)
        gbs = 2 * n * 2 / dt / 1e9  # read + write
        out[f"{mb}MB"] = round(gbs, 1)
        print(f"# copy {mb} MB: {dt * 1e3:.2f} ms  {gbs:.0f} GB/s",
              file=sys.stderr, flush=True)
    return out


def matmul_rate():
    """Big bf16 matmul TFLOP/s (the MXU ceiling for this session)."""
    out = {}
    for n in (2048, 4096):
        a = jnp.ones((n, n), jnp.bfloat16)
        f = jax.jit(lambda a: a @ a)
        dt = _time(f, a)
        tf = 2 * n**3 / dt / 1e12
        out[f"{n}^3"] = round(tf, 1)
        print(f"# matmul {n}: {dt * 1e3:.2f} ms  {tf:.0f} TFLOP/s",
              file=sys.stderr, flush=True)
    return out


def step_time():
    from hsimae_tpu.config import preset
    from hsimae_tpu.models.hsimae import build_hsimae, init_model
    from hsimae_tpu.models.masking import grid_shape_candidates
    from hsimae_tpu.train.optim import pretrain_optimizer
    from hsimae_tpu.train.pretrain import TrainState, make_pretrain_step

    cfg = preset("HSIMAE-B", compute_dtype=jnp.bfloat16)
    model = build_hsimae(cfg)
    if jax.devices()[0].platform != "cpu":
        with jax.default_device(jax.devices("cpu")[0]):
            params = jax.device_get(init_model(model, seed=0)["params"])
        params = jax.device_put(params, jax.devices()[0])
    else:
        params = init_model(model, seed=0)["params"]
    tx, _ = pretrain_optimizer(5e-4, 5e-2, total_steps=10_000)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_pretrain_step(model)
    lt, ll = grid_shape_candidates(cfg.t_size, cfg.l_size, 0.5)[0]
    imgs = jax.device_put(np.random.default_rng(0).standard_normal(
        (BATCH, cfg.img_size, cfg.img_size, cfg.bands)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    for i in range(5):
        state, loss = step(state, imgs, jax.random.fold_in(key, i), lt, ll)
        float(loss)
    t0 = time.perf_counter()
    n = 10
    for i in range(n):
        state, loss = step(state, imgs, jax.random.fold_in(key, 100 + i),
                           lt, ll)
    float(loss)
    dt = (time.perf_counter() - t0) / n
    print(f"# train step: {dt * 1e3:.2f} ms ({BATCH / dt:,.0f} patches/s)",
          file=sys.stderr, flush=True)
    return dt, cfg


def model_minimum(dt_step, cfg, bw, mm):
    """Minimum step time from actual bytes + flops at THIS session's rates.

    Bytes (bf16 activations, f32 params/opt; the big movers at bs=2048):
      fwd+bwd activation traffic ~= 2 x fwd writes + bwd reads ~= 3 x A
      where A = total activation bytes of one forward (computed coarsely
      from the layer shapes); params+grads+adam m/v: 6 f32 copies moved.
    Flops: 0.55 GFLOP/patch (RESULTS.md MFU math).
    """
    n = BATCH
    d, dd = cfg.embed_dim, cfg.decoder_dim
    tok_e = 18          # kept tokens (mask 0.5)
    tok_d = 36
    # per-token bytes through one encoder block (q,k,v,attn,proj,mlp x3)
    blk = lambda dim: 10 * dim * 2  # ~10 dim-wide tensors, bf16
    act = n * (cfg.depth * tok_e * blk(d) + cfg.decoder_depth * tok_d * blk(dd)
               + tok_e * d * 2 * 4 + tok_d * dd * 2 * 4)
    act_traffic = 3 * act
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        jax.eval_shape(lambda: None) or []) ) if False else 3_400_000
    opt_traffic = 6 * n_params * 4
    flops = 0.55e9 * n
    bw_gbs = max(bw.values()) * 1e9
    tf = max(mm.values()) * 1e12
    t_bytes = (act_traffic + opt_traffic) / bw_gbs
    t_flops = flops / tf
    t_model = max(t_bytes, t_flops)
    return {
        "act_traffic_mb": round(act_traffic / 2**20, 1),
        "opt_traffic_mb": round(opt_traffic / 2**20, 1),
        "flops_gflop": round(flops / 1e9, 1),
        "t_bytes_ms": round(t_bytes * 1e3, 2),
        "t_flops_ms": round(t_flops * 1e3, 2),
        "t_model_ms": round(t_model * 1e3, 2),
        "t_step_ms": round(dt_step * 1e3, 2),
        "step_vs_model": round(dt_step / t_model, 2),
    }


def main():
    bw = bandwidth_curve()
    mm = matmul_rate()
    dt, cfg = step_time()
    sol = model_minimum(dt, cfg, bw, mm)
    mode = "throttled" if dt > 0.05 else "fast"
    print(json.dumps({"session_mode": mode, "bandwidth_gbs": bw,
                      "matmul_tflops": mm, **sol}), flush=True)


if __name__ == "__main__":
    main()
