"""Tests for the mesh/sharding layer on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from hsimae_tpu.parallel import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.shape["data"] == 8 and m.shape["model"] == 1
    m = make_mesh(data=4, model=2)
    assert m.shape["data"] == 4 and m.shape["model"] == 2
    m = make_mesh(model=2)  # data=-1 -> 4
    assert m.shape["data"] == 4
    with pytest.raises(AssertionError):
        make_mesh(model=3)  # 8 % 3 != 0


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == P("data")
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_replicate_params():
    mesh = make_mesh()
    tree = {"w": jnp.ones((3, 3)), "b": jnp.zeros(3)}
    rep = replicate(tree, mesh)
    assert rep["w"].sharding.spec == P()
    assert len(rep["w"].addressable_shards) == 8


def test_sharded_train_step_matches_single_device():
    """The jitted dual step produces the same loss sharded and unsharded."""
    from hsimae_tpu.config import preset
    from hsimae_tpu.models.hsimae import build_dual_vit, init_model
    from hsimae_tpu.train.finetune import TrainState, make_dual_step
    from hsimae_tpu.train.optim import finetune_optimizer

    cfg = preset("HSIMAE-S", depth=2, s_depth=1, decoder_depth=1,
                 embed_dim=32, num_heads=2, decoder_dim=16, decoder_num_heads=2)
    model = build_dual_vit(cfg, 4)
    # host copy: the jitted step donates its state, so each run() needs
    # fresh device buffers
    params_host = jax.device_get(init_model(model, seed=0)["params"])
    tx, _ = finetune_optimizer(1e-3, 1e-3, epochs=2, steps_per_epoch=2)

    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 9, 9, 32))
    xu = jax.random.uniform(jax.random.PRNGKey(2), (8, 9, 9, 32))
    y = jnp.asarray([1, 2, 3, 1, 2, 3, 1, 2])
    w = jnp.ones(8, jnp.float32)
    rng = jax.random.PRNGKey(3)

    def run(shard):
        params = jax.tree_util.tree_map(jnp.asarray, params_host)
        st = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
        step = make_dual_step(model, lamda=10.0, flip_augment=False)
        a, b, c, d = x, y, w, xu
        if shard:
            mesh = make_mesh()
            st = replicate(st, mesh)
            a, d = shard_batch(a, mesh), shard_batch(d, mesh)
        st, loss, rec, logits = step(st, a, b, c, d, w, rng, 2, 4)
        return float(loss), np.asarray(logits)

    l1, g1 = run(False)
    l2, g2 = run(True)
    assert np.isclose(l1, l2, rtol=1e-5)
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


def test_process_local_slice_partitions_exactly():
    from hsimae_tpu.parallel.mesh import process_local_slice

    for n, pc in [(16, 4), (17, 4), (8, 1), (5, 3), (4, 8)]:
        covered = []
        for p in range(pc):
            sl = process_local_slice(n, process_index=p, process_count=pc)
            covered.extend(range(n)[sl])
        assert covered == list(range(n)), (n, pc)
        sizes = [
            len(range(n)[process_local_slice(n, p, pc)]) for p in range(pc)
        ]
        assert max(sizes) - min(sizes) <= 1, (n, pc)


def test_process_local_slice_single_process_degenerate():
    from hsimae_tpu.parallel.mesh import process_local_slice

    # no explicit index/count: real runtime values (single process here)
    assert jax.process_count() == 1
    assert process_local_slice(12) == slice(0, 12)


def test_shard_batch_multihost_path_degenerates_to_device_put():
    """The make_array_from_process_local_data assembly path (forced via
    multihost=True) must produce the same global array + sharding as the
    single-process device_put path."""
    mesh = make_mesh()
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    a = shard_batch(jnp.asarray(x), mesh)
    b = shard_batch(x, mesh, multihost=True)
    assert b.sharding.spec == P("data")
    assert b.shape == (16, 4)
    assert len(b.addressable_shards) == 8
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pad_to_multiple():
    assert pad_to_multiple(9, 8) == 16
    assert pad_to_multiple(16, 8) == 16
    assert pad_to_multiple(1, 8) == 8


def test_tp_spec_rules():
    from jax.sharding import PartitionSpec as P

    from hsimae_tpu.parallel.tp import tp_spec

    assert tp_spec(("blocks_1_0", "attn", "q", "kernel"), 2) == P(None, "model")
    assert tp_spec(("blocks_1_0", "attn", "proj", "kernel"), 2) == P("model", None)
    assert tp_spec(("blocks_1_0", "mlp", "w2", "kernel"), 2) == P("model", None)
    assert tp_spec(("blocks_1_0", "mlp", "w1", "bias"), 1) == P("model")
    assert tp_spec(("patch_embed", "proj", "kernel"), 2) == P(None, None)
    assert tp_spec(("norm", "scale"), 1) == P(None)


def test_tp_sharded_step_matches_replicated():
    """Megatron-style TP shardings must not change the math (GSPMD inserts
    the all-reduces)."""
    from hsimae_tpu.config import preset
    from hsimae_tpu.models.hsimae import build_dual_vit, init_model
    from hsimae_tpu.parallel.tp import shard_params_tp
    from hsimae_tpu.train.finetune import TrainState, make_dual_step
    from hsimae_tpu.train.optim import finetune_optimizer

    cfg = preset("HSIMAE-S", depth=2, s_depth=1, decoder_depth=1,
                 embed_dim=32, num_heads=2, decoder_dim=16, decoder_num_heads=2)
    model = build_dual_vit(cfg, 4)
    params_host = jax.device_get(init_model(model, seed=0)["params"])
    tx, _ = finetune_optimizer(1e-3, 1e-3, epochs=2, steps_per_epoch=2)

    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 9, 9, 32))
    xu = jax.random.uniform(jax.random.PRNGKey(2), (8, 9, 9, 32))
    y = jnp.asarray([1, 2, 3, 1, 2, 3, 1, 2])
    w = jnp.ones(8, jnp.float32)

    def run(tp):
        params = jax.tree_util.tree_map(jnp.asarray, params_host)
        a, d = x, xu
        if tp:
            mesh = make_mesh(data=4, model=2)
            params = shard_params_tp(params, mesh)
            a, d = shard_batch(a, mesh), shard_batch(d, mesh)
        st = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
        step = make_dual_step(model, lamda=10.0, flip_augment=False)
        st, loss, rec, logits = step(st, a, y, w, d, w, jax.random.PRNGKey(3), 2, 4)
        return float(loss), np.asarray(logits)

    l1, g1 = run(False)
    l2, g2 = run(True)
    assert np.isclose(l1, l2, rtol=1e-5)
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


def test_dp_classify_scene_matches_single_device():
    """Mesh-sharded full-scene inference == single-device inference."""
    from hsimae_tpu.config import EvalConfig, preset
    from hsimae_tpu.models.hsimae import build_hsi_vit, init_model
    from hsimae_tpu.train.evaluate import classify_scene

    cfg = preset("HSIMAE-S", depth=2, s_depth=1, decoder_depth=1,
                 embed_dim=32, num_heads=2, decoder_dim=16,
                 decoder_num_heads=2, bands=8)
    n_classes = 4
    params = jax.device_get(
        init_model(build_hsi_vit(cfg, n_classes), seed=0)["params"])
    scene = np.random.default_rng(0).standard_normal(
        (11, 13, cfg.bands)).astype(np.float32)
    # bs=30 with 11*13=143 pixels: exercises padding of the final batch AND
    # the round-up of bs to a multiple of the data axis (30 -> 32 on data=8)
    ecfg = EvalConfig(batch_size=30)
    single = classify_scene(scene, params, cfg, n_classes, ecfg)
    sharded = classify_scene(scene, params, cfg, n_classes, ecfg,
                             mesh=make_mesh())
    np.testing.assert_array_equal(sharded, single)


def test_dp_fused_chunk_matches_single_device():
    """The fused lax.scan chunk with a mesh (its with_sharding_constraint dp
    path) produces the same loss and params as the meshless chunk."""
    from hsimae_tpu.config import preset
    from hsimae_tpu.data.gwpca import apply_gwpca
    from hsimae_tpu.data.pipeline import MultiScenePatchSource
    from hsimae_tpu.data.synthetic import make_synthetic_pretrain_scenes
    from hsimae_tpu.data.windows import build_pretrain_cut_index
    from hsimae_tpu.models.hsimae import build_hsimae, init_model
    from hsimae_tpu.models.masking import grid_shape_candidates
    from hsimae_tpu.train.optim import pretrain_optimizer
    from hsimae_tpu.train.pretrain import TrainState, make_fused_pretrain_chunk

    cfg = preset("HSIMAE-S", depth=2, s_depth=1, decoder_depth=1,
                 embed_dim=32, num_heads=2, decoder_dim=16, decoder_num_heads=2)
    scenes = [apply_gwpca(s, 32) for s in
              make_synthetic_pretrain_scenes(2, (28, 36), bands=40, seed=12)]
    src = MultiScenePatchSource(scenes, patch_size=9)
    idx = build_pretrain_cut_index([s.shape for s in scenes], 9, coarse_from=1)
    model = build_hsimae(cfg)
    params_host = jax.device_get(init_model(model, seed=0)["params"])
    lt, ll = grid_shape_candidates(cfg.t_size, cfg.l_size, 0.5)[0]
    K, B = 2, 16  # B divisible by the 8-device data axis
    locs = jnp.asarray(idx.locs[: K * B].reshape(K, B, 3))
    base = jax.random.PRNGKey(9)

    def run(mesh):
        params = jax.tree_util.tree_map(jnp.asarray, params_host)
        tx, _ = pretrain_optimizer(1e-3, 5e-2, total_steps=100)
        st = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
        if mesh is not None:
            st = replicate(st, mesh)
        chunk = make_fused_pretrain_chunk(model, src, mesh=mesh)
        st, loss = chunk(st, locs, base, lt, ll)
        return float(loss), jax.device_get(st.params)

    l1, p1 = run(None)
    l2, p2 = run(make_mesh())
    assert np.isclose(l1, l2, rtol=1e-5)
    import chex

    chex.assert_trees_all_close(p1, p2, rtol=1e-4, atol=1e-6)
