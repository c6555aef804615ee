"""Tests for optimizer/schedules, losses, checkpoints, and train steps."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hsimae_tpu.config import FinetuneConfig, ModelConfig, PretrainConfig, preset
from hsimae_tpu.checkpoints.io import (
    latest_checkpoint,
    partial_restore,
    restore_checkpoint,
    save_checkpoint,
    save_params,
    load_params,
)
from hsimae_tpu.checkpoints.torch_convert import (
    convert_torch_state_dict,
    export_torch_state_dict,
)
from hsimae_tpu.models.hsimae import HSIMAE, build_dual_vit, build_hsimae, init_model
from hsimae_tpu.train.finetune import cross_entropy_ignore0, make_dual_step, TrainState
from hsimae_tpu.train.optim import (
    finetune_optimizer,
    pretrain_optimizer,
    timm_cosine_schedule,
    wd_mask,
)
from hsimae_tpu.train.pretrain import make_pretrain_step
from hsimae_tpu.train.pretrain import TrainState as PTState


TINY = preset(
    "HSIMAE-S", depth=2, s_depth=1, decoder_depth=1,
    embed_dim=32, num_heads=2, decoder_dim=16, decoder_num_heads=2,
)


def test_timm_cosine_schedule_values():
    # warmup: linear from warmup_lr_init; cosine uses GLOBAL t (not t-warmup)
    s = timm_cosine_schedule(1.0, t_initial=100, warmup_t=10, lr_min=0.01,
                             warmup_lr_init=0.05)
    assert np.isclose(float(s(0)), 0.05)
    assert np.isclose(float(s(5)), 0.05 + 5 * (1.0 - 0.05) / 10)
    t = 50
    expect = 0.01 + 0.5 * (1.0 - 0.01) * (1 + np.cos(np.pi * t / 100))
    assert np.isclose(float(s(t)), expect, rtol=1e-6)
    # end of schedule reaches lr_min
    assert np.isclose(float(s(100)), 0.01, atol=1e-7)


def test_schedules_match_timm_stepped_after_update():
    """timm's scheduler is stepped AFTER the optimizer step and initialized
    at warmup_lr_init, so iteration/epoch t trains at cosine(t-1) with t=0 at
    warmup_lr_init (`Model_Pretraining.py:100-105`,
    `Model_Finetuning.py:234`)."""
    # pretrain: per-iteration, warmup_lr_init=0
    _, s = pretrain_optimizer(1e-2, 0.0, total_steps=100)
    inner = timm_cosine_schedule(1e-2, 100, warmup_t=5, lr_min=1e-6)
    assert float(s(0)) == 0.0           # first update at warmup_lr_init
    assert np.isclose(float(s(1)), 0.0)  # = inner(0) = warmup_lr_init
    assert np.isclose(float(s(3)), float(inner(2)))
    assert np.isclose(float(s(50)), float(inner(49)))
    # finetune: per-epoch, warmup_lr_init = lr_min = lr * 0.01
    _, s = finetune_optimizer(1e-2, 0.0, epochs=10, steps_per_epoch=3)
    ep = timm_cosine_schedule(1e-2, 10, warmup_t=1, lr_min=1e-4,
                              warmup_lr_init=1e-4)
    for step in range(6):  # epochs 0 and 1 both train at cosine(0) = 1e-4
        assert np.isclose(float(s(step)), 1e-4), step
    assert np.isclose(float(s(6)), float(ep(1)))   # epoch 2 -> cosine(1)
    assert np.isclose(float(s(29)), float(ep(8)))  # epoch 9 -> cosine(8)


def test_classify_scene_raises_on_uncovered_cls_head():
    """Evaluating with a pretrain-only checkpoint (no cls_head) must fail
    loudly, not silently score a random head (ADVICE r1)."""
    from hsimae_tpu.train.evaluate import classify_scene

    pre_params = init_model(build_hsimae(TINY), seed=0)["params"]
    scene = np.random.default_rng(0).random((12, 12, TINY.bands)).astype(np.float32)
    with pytest.raises(ValueError, match="cls_head"):
        classify_scene(scene, pre_params, TINY, num_classes=4)


def test_wd_mask_excludes_bias_and_norm():
    params = {
        "blocks_1_0": {
            "attn": {"q": {"kernel": np.ones(1), "bias": np.ones(1)}},
            "norm1": {"scale": np.ones(1), "bias": np.ones(1)},
        },
        "cls_head": {"kernel": np.ones(1), "bias": np.ones(1)},
    }
    m = wd_mask(params)
    assert m["blocks_1_0"]["attn"]["q"]["kernel"] is True
    assert m["blocks_1_0"]["attn"]["q"]["bias"] is False
    assert m["blocks_1_0"]["norm1"]["scale"] is False  # 'norm' in path
    assert m["blocks_1_0"]["norm1"]["bias"] is False
    assert m["cls_head"]["kernel"] is True


def test_cross_entropy_ignore0_matches_manual():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((6, 4)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3, 0, 1])
    got = float(cross_entropy_ignore0(logits, labels))
    lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    keep = [1, 2, 3, 5]
    want = -np.mean([lp[i, int(labels[i])] for i in keep])
    assert np.isclose(got, want, rtol=1e-6)


def test_partial_restore_intersection():
    tgt = {"a": {"w": np.zeros((2, 2))}, "b": {"w": np.zeros(3)}}
    src = {"a": {"w": np.ones((2, 2))}, "b": {"w": np.ones(4)}, "c": np.ones(1)}
    out, loaded, skipped = partial_restore(tgt, src, verbose=False)
    assert np.all(out["a"]["w"] == 1)  # loaded (same shape)
    assert np.all(out["b"]["w"] == 0)  # shape mismatch -> kept
    assert ("a", "w") in loaded and len(skipped) == 2


def test_checkpoint_roundtrip(tmp_path):
    model = build_hsimae(TINY)
    params = init_model(model, seed=0)["params"]
    tx, _ = pretrain_optimizer(1e-3, 1e-2, total_steps=10)
    state = PTState.create(apply_fn=model.apply, params=params, tx=tx)
    save_checkpoint(str(tmp_path), 7, state)
    ck = latest_checkpoint(str(tmp_path))
    assert ck and ck.endswith("ckpt_7.msgpack")
    restored = restore_checkpoint(ck, state)
    chex_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: np.allclose(a, b), state.params, restored.params)
    )
    assert chex_equal

    p = save_params(str(tmp_path / "p.msgpack"), params)
    again = load_params(p, params)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: np.array_equal(a, b), params, again)
    )


def test_torch_converter_roundtrip():
    """export (flax -> torch names) then convert back is the identity."""
    cfg = TINY.replace(num_classes=5)
    model = build_dual_vit(cfg, 5)
    params = jax.device_get(init_model(model, seed=1)["params"])
    sd = export_torch_state_dict(params, cfg)
    # torch-side names exist
    assert "patch_embed.proj.weight" in sd
    assert sd["patch_embed.proj.weight"].shape == (
        cfg.embed_dim, 1, cfg.b_patch_size, cfg.patch_size, cfg.patch_size
    )
    assert any(k.startswith("blocks_1.0.attn.q") for k in sd)
    assert "pos_embed" in sd and "mask_token" in sd
    back = convert_torch_state_dict(sd)
    merged, loaded, _ = partial_restore(params, back, verbose=False)
    flat_p = jax.tree_util.tree_leaves(params)
    flat_m = jax.tree_util.tree_leaves(merged)
    assert len(loaded) == len(flat_p)  # every leaf matched
    for a, b in zip(flat_p, flat_m):
        assert np.allclose(a, b)


def test_pretrain_step_reduces_loss():
    model = build_hsimae(TINY)
    params = init_model(model, seed=0)["params"]
    tx, _ = pretrain_optimizer(1e-3, 1e-4, total_steps=50)
    state = PTState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_pretrain_step(model, flip_augment=False)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (16, 9, 9, 32))
    losses = []
    for i in range(12):
        state, loss = step(state, imgs, jax.random.fold_in(rng, 0), 2, 9)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_pretrain_optimizer_bf16_mu_state():
    """adam_mu_dtype='bfloat16' stores the first moment in bf16 (the HBM byte
    cut), leaves nu in f32, and still trains the loss down."""
    model = build_hsimae(TINY)
    params = init_model(model, seed=0)["params"]
    tx, _ = pretrain_optimizer(1e-3, 1e-4, total_steps=50,
                               mu_dtype=jnp.bfloat16)
    state = PTState.create(apply_fn=model.apply, params=params, tx=tx)
    adam = state.opt_state[0][0] if isinstance(state.opt_state[0], tuple) \
        else state.opt_state[0]
    mu_dtypes = {np.asarray(x).dtype for x in jax.tree.leaves(adam.mu)}
    nu_dtypes = {np.asarray(x).dtype for x in jax.tree.leaves(adam.nu)}
    assert mu_dtypes == {np.dtype(jnp.bfloat16)}, mu_dtypes
    assert nu_dtypes == {np.dtype(np.float32)}, nu_dtypes

    step = make_pretrain_step(model, flip_augment=False)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (16, 9, 9, 32))
    losses = []
    for _ in range(12):
        state, loss = step(state, imgs, jax.random.fold_in(rng, 0), 2, 9)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_dual_step_shapes_and_finite():
    cfg = TINY.replace(num_classes=4)
    model = build_dual_vit(cfg, 4)
    params = init_model(model, seed=0)["params"]
    tx, _ = finetune_optimizer(1e-3, 1e-3, epochs=2, steps_per_epoch=2)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_dual_step(model, lamda=10.0)
    x = jnp.ones((8, 9, 9, 32))
    xu = jnp.ones((8, 9, 9, 32))
    y = jnp.asarray([1, 2, 3, 1, 2, 3, 0, 0])  # two padded rows
    w = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], jnp.float32)
    state, loss, loss_rec, logits = step(
        state, x, y, w, xu, jnp.ones(8), jax.random.PRNGKey(0), 2, 4
    )
    assert logits.shape == (8, 4)
    assert np.isfinite(float(loss)) and np.isfinite(float(loss_rec))


def test_encoder_lr_scale_partitions_updates():
    """encoder_lr_scale=0.0 must freeze every non-cls_head parameter while
    the head still trains (train/optim.py::finetune_optimizer); 1.0 keeps
    the reference's uniform-lr recipe (covered by the other finetune tests)."""
    cfg = TINY.replace(num_classes=4)
    model = build_dual_vit(cfg, 4)
    params = init_model(model, seed=0)["params"]
    tx, _ = finetune_optimizer(1e-2, 1e-3, epochs=2, steps_per_epoch=2,
                               encoder_lr_scale=0.0)
    params0 = jax.tree_util.tree_map(np.asarray, params)  # donated below
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_dual_step(model, lamda=10.0)
    x = jax.random.uniform(jax.random.PRNGKey(2), (8, 9, 9, 32))
    y = jnp.asarray([1, 2, 3, 1, 2, 3, 1, 2])
    w = jnp.ones(8, jnp.float32)
    for i in range(3):
        state, *_ = step(state, x, y, w, x, w,
                         jax.random.PRNGKey(i), 2, 4)

    flat0 = jax.tree_util.tree_flatten_with_path(params0)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(state.params)[0]
    head_changed, enc_changed = [], []
    for (path0, a), (_, b) in zip(flat0, flat1):
        name = str(path0[0].key if hasattr(path0[0], "key") else path0[0])
        changed = not np.allclose(np.asarray(a), np.asarray(b))
        (head_changed if name == "cls_head" else enc_changed).append(changed)
    assert any(head_changed), "cls_head did not train"
    assert not any(enc_changed), "a frozen encoder parameter changed"


def test_padded_rows_do_not_change_loss():
    """CE and rec-loss weighting must make padding a no-op."""
    cfg = TINY.replace(num_classes=4)
    model = build_dual_vit(cfg, 4)
    params = init_model(model, seed=0)["params"]
    rng = {"mask": jax.random.PRNGKey(5), "droppath": jax.random.PRNGKey(6)}
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 9, 9, 32))
    xu = jax.random.uniform(jax.random.PRNGKey(3), (4, 9, 9, 32))
    y = jnp.asarray([1, 2, 3, 1])
    w = jnp.ones(4, jnp.float32)

    loss_rec, logits = model.apply({"params": params}, x, xu, 2, 4, False, w,
                                   rngs=rng, method=HSIMAE.forward_dual)
    ce = cross_entropy_ignore0(logits, y, w)

    # duplicate rows marked invalid must not change either loss
    x2 = jnp.concatenate([x, x[:2]])
    y2 = jnp.concatenate([y, jnp.zeros(2, y.dtype)])
    w2 = jnp.concatenate([w, jnp.zeros(2, jnp.float32)])
    loss_rec2, logits2 = model.apply({"params": params}, x2, xu, 2, 4, False, w2,
                                     rngs=rng, method=HSIMAE.forward_dual)
    ce2 = cross_entropy_ignore0(logits2, y2, w2)
    assert np.isclose(float(ce), float(ce2), rtol=1e-5)
    # rec loss differs only because mask sampling sees a bigger batch; check
    # weights zero out the padded contribution exactly when mask is shared:
    assert np.isfinite(float(loss_rec2))


def test_fused_pretrain_path_runs():
    """cfg.fused_steps > 0 exercises the lax.scan chunk path (bulk gather
    before the scan, schedule counts padded steps)."""
    from hsimae_tpu.config import PretrainConfig
    from hsimae_tpu.data.gwpca import apply_gwpca
    from hsimae_tpu.data.pipeline import MultiScenePatchSource
    from hsimae_tpu.data.synthetic import make_synthetic_pretrain_scenes
    from hsimae_tpu.data.windows import build_pretrain_cut_index
    from hsimae_tpu.train.pretrain import run_pretraining

    scenes = [apply_gwpca(s, 32) for s in
              make_synthetic_pretrain_scenes(2, (28, 36), bands=40, seed=6)]
    src = MultiScenePatchSource(scenes, patch_size=9)
    idx = build_pretrain_cut_index([s.shape for s in scenes], 9, coarse_from=1)
    params, hist = run_pretraining(
        src, idx.locs, TINY,
        PretrainConfig(epochs=1, batch_size=16, fused_steps=3, log_every=10**9),
    )
    assert len(hist["epoch_loss"]) == 1
    assert np.isfinite(hist["epoch_loss"][0])


def test_fused_chunk_matches_eager_steps():
    """The lax.scan chunk IS the eager K-step loop numerically: same bulk
    gather, flip augmentation, per-step ``fold_in`` rng split, and optimizer
    update — only dispatch structure differs. Pins the throughput fast path
    to the reference-shaped per-step semantics
    (`/root/reference/Model_Pretraining.py:93-106`)."""
    from hsimae_tpu.data.gwpca import apply_gwpca
    from hsimae_tpu.data.pipeline import MultiScenePatchSource
    from hsimae_tpu.data.synthetic import make_synthetic_pretrain_scenes
    from hsimae_tpu.data.windows import build_pretrain_cut_index
    from hsimae_tpu.models.masking import grid_shape_candidates
    from hsimae_tpu.train.optim import pretrain_optimizer
    from hsimae_tpu.train.pretrain import make_fused_pretrain_chunk

    scenes = [apply_gwpca(s, 32) for s in
              make_synthetic_pretrain_scenes(2, (28, 36), bands=40, seed=11)]
    src = MultiScenePatchSource(scenes, patch_size=9)
    idx = build_pretrain_cut_index([s.shape for s in scenes], 9,
                                   coarse_from=1)
    model = build_hsimae(TINY)
    params = init_model(model, seed=0)["params"]
    lt, ll = grid_shape_candidates(TINY.t_size, TINY.l_size, 0.5)[0]
    K, B = 3, 8
    locs = idx.locs[: K * B].reshape(K, B, 3)
    base = jax.random.PRNGKey(7)

    def fresh_state(p):
        tx, _ = pretrain_optimizer(1e-3, 5e-2, total_steps=100)
        return PTState.create(apply_fn=model.apply, params=p, tx=tx)

    st_e = fresh_state(jax.tree.map(jnp.copy, params))
    step = make_pretrain_step(model)
    losses = []
    for i in range(K):
        imgs = src.gather(jnp.asarray(locs[i]))
        st_e, loss = step(st_e, imgs, jax.random.fold_in(base, i), lt, ll)
        losses.append(float(loss))

    st_f = fresh_state(jax.tree.map(jnp.copy, params))
    chunk = make_fused_pretrain_chunk(model, src)
    st_f, mean_loss = chunk(st_f, jnp.asarray(locs), base, lt, ll)

    assert np.isclose(float(mean_loss), np.mean(losses), rtol=1e-5)
    import chex

    chex.assert_trees_all_close(st_f.params, st_e.params,
                                rtol=1e-5, atol=1e-6)
