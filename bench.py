"""Headline benchmark: MAE pretraining throughput (patches/sec/chip).

Runs the full HSIMAE-B pretraining step — on-device patch gather from a
resident multi-scene buffer, per-scene normalization, flip augmentation,
spatial-spectral grid masking, separable encoder, decoder, masked loss, AdamW
update — at the reference's production config (batch 512, 9x9x32 patches,
mask 0.5; `/root/reference/Model_Pretraining.py:119-134`), using the fused
multi-step dispatch (`lax.scan` over full train steps, bf16 compute / f32
params) and reports steady-state patches/sec on the current accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline``: the reference publishes no throughput numbers (SURVEY.md §6),
so the baseline is an estimate of the reference's torch pipeline on an A100:
the torch loop is host-bound (python DataLoader with num_workers=0, per-step
argsort masking, .item() sync; `Model_Pretraining.py:93-106`) — a generous
estimate is 100k patches/s. BASELINE.json's north star is >=5x that.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_A100_PATCHES_PER_SEC = 100_000.0  # generous estimate; see module docstring

BATCH = 512
SCAN_STEPS = 50
WARMUP_CHUNKS = 2
MEASURE_CHUNKS = 6


def main():
    from hsimae_tpu.config import PretrainConfig, preset
    from hsimae_tpu.data.pipeline import MultiScenePatchSource
    from hsimae_tpu.data.windows import build_pretrain_cut_index
    from hsimae_tpu.models.hsimae import build_hsimae, init_model
    from hsimae_tpu.models.masking import grid_shape_candidates
    from hsimae_tpu.train.optim import pretrain_optimizer
    from hsimae_tpu.train.pretrain import TrainState, make_fused_pretrain_chunk

    cfg = preset("HSIMAE-B", compute_dtype=jnp.bfloat16)
    pt = PretrainConfig(batch_size=BATCH)

    scenes = [np.random.default_rng(i).standard_normal((128, 128, cfg.bands)).astype(np.float32)
              for i in range(4)]
    source = MultiScenePatchSource(scenes, patch_size=cfg.img_size)
    index = build_pretrain_cut_index([s.shape for s in scenes], cfg.img_size,
                                     coarse_from=2)
    locs = index.locs

    model = build_hsimae(cfg)
    params = init_model(model, seed=0)["params"]
    tx, _ = pretrain_optimizer(pt.lr, pt.weight_decay, total_steps=100_000)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    chunk_fn = make_fused_pretrain_chunk(model, source)

    # fixed kept-grid shape for steady-state timing (the most common one)
    len_t, len_l = grid_shape_candidates(cfg.t_size, cfg.l_size, pt.mask_ratio)[0]

    key = jax.random.PRNGKey(0)
    rng_np = np.random.default_rng(0)

    def one_chunk(state, i):
        sel = rng_np.integers(0, len(locs), (SCAN_STEPS, BATCH))
        locs_chunk = jnp.asarray(locs[sel])
        return chunk_fn(state, locs_chunk, jax.random.fold_in(key, i), len_t, len_l)

    for i in range(WARMUP_CHUNKS):
        state, loss = one_chunk(state, i)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for i in range(MEASURE_CHUNKS):
        state, loss = one_chunk(state, WARMUP_CHUNKS + i)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    pps = MEASURE_CHUNKS * SCAN_STEPS * BATCH / dt
    n_chips = jax.device_count()
    pps_chip = pps / max(n_chips, 1)
    print(json.dumps({
        "metric": "hsimae_b_pretrain_patches_per_sec_per_chip",
        "value": round(pps_chip, 1),
        "unit": "patches/s/chip",
        "vs_baseline": round(pps_chip / REF_A100_PATCHES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
