"""Model-layer tests: sincos structure, SwiGLU rounding quirk, masking
invariants (kept set = row-major cross-product grid), patchify round trips,
and full forward/backward passes of the three model variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsimae_tpu.config import ModelConfig, preset
from hsimae_tpu.models import (
    HSIMAE,
    PatchEmbed,
    build_dual_vit,
    build_hsi_vit,
    build_hsimae,
    choose_grid_shape,
    grid_shape_candidates,
    init_model,
    mae_loss,
    patchify,
    unpatchify,
    sincos_1d,
    sincos_2d,
    sincos_3d,
    spatial_spectral_mask,
    swiglu_hidden_dim,
)

TINY = ModelConfig(
    img_size=9, patch_size=3, bands=32, b_patch_size=8,
    embed_dim=32, depth=4, s_depth=2, num_heads=2,
    decoder_dim=16, decoder_depth=1, decoder_num_heads=2,
)


# ----------------------------- pos embed -----------------------------------


def test_sincos_1d_values():
    e = sincos_1d(8, np.array([0.0, 1.0]))
    # pos 0: sin=0, cos=1
    np.testing.assert_allclose(e[0], [0, 0, 0, 0, 1, 1, 1, 1], atol=1e-12)
    # pos 1: omega_k = 10000^{-k/4}
    om = 1.0 / 10000 ** (np.arange(4) / 4.0)
    np.testing.assert_allclose(e[1], np.concatenate([np.sin(om), np.cos(om)]), rtol=1e-12)


def test_sincos_3d_structure():
    D, T, G = 16, 3, 2
    e3 = sincos_3d(D, T, G)
    assert e3.shape == (T * G * G, D)
    e1 = sincos_1d(D // 2, np.arange(T, dtype=np.float64))
    e2 = sincos_2d(D // 2, G)
    for t in range(T):
        for hw in range(G * G):
            row = e3[t * G * G + hw]
            np.testing.assert_allclose(row[: D // 2], e1[t], rtol=1e-6)  # temporal first
            np.testing.assert_allclose(row[D // 2 :], e2[hw], rtol=1e-6)


def test_sincos_2d_column_first():
    # first quarter encodes the column (w) index — the reference's w-first grid
    G, D = 3, 8
    e2 = sincos_2d(D, G)
    col = sincos_1d(D // 2, np.arange(G, dtype=np.float64))
    # token (h=2, w=1) -> first half is col-embedding of 1, second of row 2
    np.testing.assert_allclose(e2[2 * G + 1][: D // 2], col[1], rtol=1e-12)
    np.testing.assert_allclose(e2[2 * G + 1][D // 2 :], col[2], rtol=1e-12)


# ------------------------------ swiglu --------------------------------------


def test_swiglu_rounding_quirk():
    # multiple_of == int(mlp_ratio): reference Block passes mlp_ratio there
    assert swiglu_hidden_dim(64, 4.0) == 172
    assert swiglu_hidden_dim(128, 4.0) == 344
    assert swiglu_hidden_dim(256, 4.0) == 684


# ------------------------------ masking -------------------------------------


def test_grid_shape_candidates_production_configs():
    assert set(grid_shape_candidates(4, 9, 0.5)) == {(2, 9), (3, 6)}
    assert set(grid_shape_candidates(4, 9, 0.8)) == {(2, 4), (4, 2)}
    lt, ll = choose_grid_shape(4, 9, 0.5)
    assert (lt, ll) in {(2, 9), (3, 6)}


def test_spatial_spectral_mask_invariants():
    T, L, lt, ll, N = 4, 9, 3, 6, 5
    gm = spatial_spectral_mask(jax.random.key(0), N, T, L, lt, ll)
    ids = np.asarray(gm.ids_keep)
    mask = np.asarray(gm.mask)
    assert ids.shape == (N, lt * ll)
    # mask: exactly T*L - K ones; zeros exactly at kept ids
    np.testing.assert_allclose(mask.sum(1), T * L - lt * ll)
    for n in range(N):
        assert (mask[n][ids[n]] == 0).all()
        # kept set is the cross product of its rows and cols, row-major sorted
        ts = np.unique(ids[n] // L)
        ls = np.unique(ids[n] % L)
        assert len(ts) == lt and len(ls) == ll
        grid = (ts[:, None] * L + ls[None, :]).reshape(-1)
        np.testing.assert_array_equal(ids[n], grid)
        assert (np.diff(ids[n]) > 0).all()


def test_mask_is_random_across_examples_and_keys():
    gm1 = spatial_spectral_mask(jax.random.key(1), 64, 4, 9, 2, 9)
    gm2 = spatial_spectral_mask(jax.random.key(2), 64, 4, 9, 2, 9)
    assert not np.array_equal(np.asarray(gm1.ids_keep), np.asarray(gm2.ids_keep))
    # not all rows identical within one batch
    ids = np.asarray(gm1.ids_t)
    assert len(np.unique(ids, axis=0)) > 1


# ----------------------------- patchify -------------------------------------


def test_patchify_roundtrip():
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 9, 9, 32)).astype(np.float32)
    x = patchify(jnp.asarray(imgs), 3, 8)
    assert x.shape == (2, 4 * 9, 72)
    back = unpatchify(x, 3, 8, 3, 4)
    np.testing.assert_allclose(np.asarray(back), imgs, rtol=1e-6)


def test_patchify_matches_patch_embed_tokenization():
    """PatchEmbed with identity kernel must reproduce patchify features."""
    imgs = jnp.asarray(np.random.default_rng(1).normal(size=(2, 9, 9, 32)), jnp.float32)
    pe = PatchEmbed(embed_dim=72, patch_size=3, b_patch_size=8)
    params = pe.init(jax.random.key(0), imgs)
    params = jax.tree.map(lambda p: jnp.eye(72) if p.shape == (72, 72) else p, params)
    tokens = pe.apply(params, imgs)  # [N, T, L, 72]
    ref = patchify(imgs, 3, 8).reshape(2, 4, 9, 72)
    np.testing.assert_allclose(np.asarray(tokens), np.asarray(ref), rtol=1e-5)


# ------------------------------ mae loss ------------------------------------


def test_mae_loss_zero_when_pred_equals_normalized_target():
    rng = np.random.default_rng(2)
    target = jnp.asarray(rng.normal(size=(2, 36, 72)), jnp.float32)
    mean = target.mean(-1, keepdims=True)
    std = jnp.sqrt(target.var(-1, keepdims=True, ddof=1) + 1e-6)
    pred = (target - mean) / std
    mask = jnp.ones((2, 36))
    loss, m, s = mae_loss(pred, target, mask, norm_pix=True)
    assert float(loss) < 1e-10
    np.testing.assert_allclose(np.asarray(m), np.asarray(mean), rtol=1e-5)


def test_mae_loss_sample_weight_excludes_padding():
    rng = np.random.default_rng(3)
    target = jnp.asarray(rng.normal(size=(4, 6, 8)), jnp.float32)
    pred = jnp.zeros_like(target)
    mask = jnp.ones((4, 6))
    w_full, _, _ = mae_loss(pred, target, mask, False)
    w_half, _, _ = mae_loss(pred, target, mask, False, sample_weight=jnp.array([1, 1, 0, 0.0]))
    ref = float(((target[:2]) ** 2).mean())
    np.testing.assert_allclose(float(w_half), ref, rtol=1e-5)
    assert abs(float(w_full) - ref) > 1e-6  # differs when padding counted


# ------------------------------ models --------------------------------------


def _rngs(seed=0):
    return {"mask": jax.random.key(seed + 1), "droppath": jax.random.key(seed + 2)}


def test_hsimae_pretrain_forward_and_grad():
    model = build_hsimae(TINY)
    params = init_model(model, 0)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(4, 9, 9, 32)), jnp.float32)

    def loss_fn(p):
        loss, pred, mask, _ = model.apply(
            p, imgs, 2, 9, True, rngs=_rngs(), method=HSIMAE.forward_pretrain
        )
        return loss, (pred, mask)

    (loss, (pred, mask)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert pred.shape == (4, 36, 72)
    assert mask.shape == (4, 36)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # every parameter receives gradient (encoder + decoder are all live)
    nonzero = [float(jnp.abs(g).sum()) > 0 for g in leaves]
    assert all(nonzero), f"{sum(nonzero)}/{len(nonzero)} grads nonzero"


def test_remat_matches_baseline_exactly():
    """ModelConfig.remat changes only the autodiff schedule: identical param
    tree, identical loss, grads equal to the non-remat model (the remat A/B
    on TPU is purely a bytes-vs-recompute trade, never a numerics change)."""
    base = build_hsimae(TINY)
    rem = build_hsimae(TINY.replace(remat=True))
    params = init_model(base, 0)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(init_model(rem, 0)))
    imgs = jnp.asarray(np.random.default_rng(1).normal(size=(4, 9, 9, 32)),
                       jnp.float32)

    def loss_fn(p, m):
        loss, _, _, _ = m.apply(p, imgs, 2, 9, True, rngs=_rngs(),
                                method=HSIMAE.forward_pretrain)
        return loss

    (l0, g0) = jax.value_and_grad(loss_fn)(params, base)
    (l1, g1) = jax.value_and_grad(loss_fn)(params, rem)
    assert np.isclose(float(l0), float(l1), rtol=1e-6)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.allclose(a, b, rtol=1e-5, atol=1e-7), g0, g1))


def test_remat_with_droppath_uses_one_rng_draw():
    """Remat + stochastic depth: the droppath rng must be drawn once and
    replayed in the rematerialized backward (flax threads the rng through
    jax.checkpoint), so grads stay finite and deterministic per key."""
    cfg = TINY.replace(drop_path=0.2, remat=True, num_classes=5)
    model = build_dual_vit(cfg, num_classes=5)
    params = init_model(model, 0)
    imgs = jnp.asarray(np.random.default_rng(2).normal(size=(4, 9, 9, 32)),
                       jnp.float32)
    y = jnp.asarray([1, 2, 3, 4], jnp.int32)

    def loss_fn(p):
        rec, logits = model.apply(p, imgs, imgs, 2, 5, True, rngs=_rngs(),
                                  method=HSIMAE.forward_dual)
        onehot = jax.nn.one_hot(y, 5)
        return rec + ((logits - onehot) ** 2).mean()

    g_a = jax.grad(loss_fn)(params)
    g_b = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(g_a))
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)), g_a, g_b))


def test_dual_vit_forward():
    model = build_dual_vit(TINY, num_classes=7)
    params = init_model(model, 0)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(size=(4, 9, 9, 32)), jnp.float32)
    imgs_u = jnp.asarray(rng.normal(size=(6, 9, 9, 32)), jnp.float32)
    loss_rec, logits = model.apply(
        params, imgs, imgs_u, 2, 4, True, rngs=_rngs(), method=HSIMAE.forward_dual
    )
    assert np.isfinite(float(loss_rec))
    assert logits.shape == (4, 7)
    # eval path: logits only, deterministic
    l1 = model.apply(params, imgs, False, method=HSIMAE.classify)
    l2 = model.apply(params, imgs, False, method=HSIMAE.classify)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2))


def test_hsi_vit_loads_subset_and_classifies():
    dual = build_dual_vit(TINY, num_classes=5)
    vit = build_hsi_vit(TINY, num_classes=5)
    p_dual = init_model(dual, 0)
    p_vit = init_model(vit, 1)
    # HSIViT params are a strict subset of DualViT params (name intersection)
    import flax.traverse_util as tu

    fd = tu.flatten_dict(p_dual["params"])
    fv = tu.flatten_dict(p_vit["params"])
    assert set(fv).issubset(set(fd))
    # copying shared params gives identical classification
    merged = {k: fd[k] for k in fv}
    logits_vit = vit.apply(
        {"params": tu.unflatten_dict(merged)},
        jnp.ones((2, 9, 9, 32)),
        False,
        method=HSIMAE.classify,
    )
    logits_dual = dual.apply(p_dual, jnp.ones((2, 9, 9, 32)), False, method=HSIMAE.classify)
    np.testing.assert_allclose(np.asarray(logits_vit), np.asarray(logits_dual), rtol=1e-5)


def test_preset_shapes():
    for name in ("HSIMAE-B", "HSIMAE-L"):
        c = preset(name)
        assert c.t_size == 4 and c.l_size == 9 and c.num_patches == 36
        assert c.pixels_per_patch == 72


def test_bf16_compute_dtype_runs():
    cfg = TINY.replace(compute_dtype=jnp.bfloat16)
    model = build_hsimae(cfg)
    params = init_model(model, 0)
    imgs = jnp.ones((2, 9, 9, 32), jnp.float32)
    loss, *_ = model.apply(params, imgs, 2, 9, True, rngs=_rngs(), method=HSIMAE.forward_pretrain)
    assert np.isfinite(float(loss))
    # params stay f32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))


def test_gap_head_mode():
    """head_mode='gap' pools over all tokens with cls_head in = embed_dim
    (`Models.py:964-968`)."""
    import jax
    import jax.numpy as jnp

    from hsimae_tpu.config import preset
    from hsimae_tpu.models.hsimae import HSIMAE, build_hsi_vit, init_model

    cfg = preset("HSIMAE-S", depth=2, s_depth=1, decoder_depth=1,
                 embed_dim=32, num_heads=2, decoder_dim=16,
                 decoder_num_heads=2, head_mode="gap")
    m = build_hsi_vit(cfg, 5)
    p = init_model(m, seed=0)["params"]
    assert p["cls_head"]["kernel"].shape == (32, 5)  # embed_dim, not *T
    y = m.apply({"params": p}, jnp.ones((2, 9, 9, 32)), False,
                method=HSIMAE.classify)
    assert y.shape == (2, 5)
