"""Diagnose the RESOURCE_EXHAUSTED failure of the reference-scale pretrain.

Loads the 15 cached GWPCA'd scenes (~4.9 GB f32), builds the
MultiScenePatchSource, and walks the exact allocation sequence of
`run_pretraining`'s first step — printing device memory_stats() after each
stage — so the failing allocation and the true HBM budget of this
(multi-tenant) chip are visible.
"""

import glob
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DEV = jax.devices()[0]


def stats(tag):
    s = DEV.memory_stats() or {}
    inuse = s.get("bytes_in_use", 0) / 2**30
    limit = s.get("bytes_limit", 0) / 2**30
    peak = s.get("peak_bytes_in_use", 0) / 2**30
    print(f"[mem] {tag}: in_use={inuse:.2f}G peak={peak:.2f}G limit={limit:.2f}G",
          flush=True)


def main():
    stats("start")
    scenes = [np.load(p) for p in sorted(glob.glob("/tmp/refscale/scenes/scene_*.npy"))]
    print(f"loaded {len(scenes)} scenes, "
          f"{sum(s.nbytes for s in scenes)/2**30:.2f}G host", flush=True)

    from hsimae_tpu.data.pipeline import MultiScenePatchSource
    from hsimae_tpu.data.windows import build_pretrain_cut_index

    t0 = time.perf_counter()
    source = MultiScenePatchSource(scenes, patch_size=9)
    source._flat.block_until_ready()
    stats(f"scene buffer resident ({time.perf_counter()-t0:.1f}s)")

    index = build_pretrain_cut_index([s.shape for s in scenes], 9,
                                     coarse_from=14,
                                     rng=np.random.default_rng(42))
    locs = index.locs
    print(f"{len(locs)} cuts", flush=True)

    t0 = time.perf_counter()
    imgs = source.gather(locs[:2048])
    imgs.block_until_ready()
    stats(f"first gather ({time.perf_counter()-t0:.1f}s)")
    t0 = time.perf_counter()
    imgs = source.gather(locs[2048:4096])
    imgs.block_until_ready()
    stats(f"second gather ({time.perf_counter()-t0:.1f}s)")

    from hsimae_tpu.config import PretrainConfig, preset
    from hsimae_tpu.models.hsimae import build_hsimae, init_model
    from hsimae_tpu.train.optim import pretrain_optimizer
    from hsimae_tpu.train.pretrain import TrainState, make_pretrain_step

    mcfg = preset("HSIMAE-B")
    model = build_hsimae(mcfg)
    t0 = time.perf_counter()
    variables = init_model(model, seed=42)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=pretrain_optimizer(5e-3, 5e-2, 1000)[0])
    jax.block_until_ready(state.params)
    stats(f"train state ({time.perf_counter()-t0:.1f}s)")

    import random as pyrandom

    from hsimae_tpu.models.masking import choose_grid_shape

    len_t, len_l = choose_grid_shape(mcfg.t_size, mcfg.l_size, 0.5,
                                     pyrandom.Random(0))
    print(f"grid ({len_t}, {len_l})", flush=True)
    step = make_pretrain_step(model)
    rng = jax.random.PRNGKey(0)
    for i in range(3):
        t0 = time.perf_counter()
        state, loss = step(state, imgs, jax.random.fold_in(rng, i), len_t, len_l)
        print(f"step {i}: loss={float(loss):.4f} ({time.perf_counter()-t0:.1f}s)",
              flush=True)
        stats(f"after step {i}")


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"FAILED: {type(e).__name__}", flush=True)
        print(str(e)[:8000], flush=True)
        stats("at failure")
