"""Preemption-safe checkpoint/resume: interrupted pretraining continues from
the saved step with identical results (the reference loses everything on a
crash — SURVEY.md §5 failure-detection row)."""

import numpy as np
import pytest

from hsimae_tpu.config import PretrainConfig, preset
from hsimae_tpu.data.gwpca import apply_gwpca
from hsimae_tpu.data.pipeline import MultiScenePatchSource
from hsimae_tpu.data.synthetic import make_synthetic_pretrain_scenes
from hsimae_tpu.data.windows import build_pretrain_cut_index
from hsimae_tpu.train.pretrain import run_pretraining


TINY = preset("HSIMAE-S", depth=2, s_depth=1, decoder_depth=1,
              embed_dim=32, num_heads=2, decoder_dim=16, decoder_num_heads=2)


@pytest.fixture(scope="module")
def corpus():
    scenes = [apply_gwpca(s, 32) for s in
              make_synthetic_pretrain_scenes(2, (30, 40), bands=48, seed=3)]
    src = MultiScenePatchSource(scenes, patch_size=9)
    idx = build_pretrain_cut_index([s.shape for s in scenes], 9, coarse_from=1)
    return src, idx.locs


def test_resume_continues_training(tmp_path, corpus):
    src, locs = corpus
    wd = str(tmp_path)
    cfg = PretrainConfig(epochs=3, batch_size=32, log_every=10**9,
                         checkpoint_every_steps=1)

    # run 3 epochs straight through
    params_full, hist_full = run_pretraining(
        src, locs, TINY, cfg, workdir=None, resume=False)

    # run 2 epochs under the SAME 3-epoch schedule (simulated preemption),
    # then resume for the third
    run_pretraining(src, locs, TINY, cfg, workdir=wd, resume=False,
                    stop_after_epochs=2)
    params_res, hist_res = run_pretraining(
        src, locs, TINY, cfg, workdir=wd, resume=True)

    # resumed run executed exactly one more epoch...
    assert len(hist_res["epoch_loss"]) == 1
    # ...and bit-matches the uninterrupted run (same rng derivation from
    # (seed, step), same data order from (seed, epoch))
    assert np.isclose(hist_res["epoch_loss"][0], hist_full["epoch_loss"][2],
                      rtol=1e-5)

    import jax

    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda x, y: np.allclose(x, y, rtol=1e-5, atol=1e-6),
        params_full, params_res))
    assert same, "resumed params diverge from the uninterrupted run"


def test_orbax_backend_resume_matches_uninterrupted(tmp_path, corpus):
    """The async orbax backend satisfies the same bit-faithful resume
    contract as the msgpack backend (checkpoints/orbax_io.py)."""
    pytest.importorskip("orbax.checkpoint")  # optional [orbax] extra
    src, locs = corpus
    cfg = PretrainConfig(epochs=3, batch_size=32, log_every=10**9,
                         checkpoint_every_steps=1,
                         checkpoint_backend="orbax")

    params_full, hist_full = run_pretraining(
        src, locs, TINY, cfg, workdir=None, resume=False)

    wd = str(tmp_path / "orbax")
    run_pretraining(src, locs, TINY, cfg, workdir=wd, resume=False,
                    stop_after_epochs=2)
    params_res, hist_res = run_pretraining(
        src, locs, TINY, cfg, workdir=wd, resume=True)

    assert len(hist_res["epoch_loss"]) == 1
    assert np.isclose(hist_res["epoch_loss"][0], hist_full["epoch_loss"][2],
                      rtol=1e-5)

    import jax

    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda x, y: np.allclose(x, y, rtol=1e-5, atol=1e-6),
        params_full, params_res))
    assert same, "orbax-resumed params diverge from the uninterrupted run"


def test_resume_with_flipped_backend_errors(tmp_path, corpus):
    """Resuming with a different --ckpt-backend than the workdir was written
    with must error instead of silently restarting from epoch 0 and
    overwriting params_final.msgpack (ADVICE r03)."""
    src, locs = corpus
    wd = str(tmp_path)
    cfg = PretrainConfig(epochs=3, batch_size=32, log_every=10**9,
                         checkpoint_every_steps=1)  # msgpack backend
    run_pretraining(src, locs, TINY, cfg, workdir=wd, resume=False,
                    stop_after_epochs=1)
    flipped = PretrainConfig(epochs=3, batch_size=32, log_every=10**9,
                             checkpoint_every_steps=1,
                             checkpoint_backend="orbax")
    pytest.importorskip("orbax.checkpoint")
    with pytest.raises(RuntimeError, match="ckpt-backend"):
        run_pretraining(src, locs, TINY, flipped, workdir=wd, resume=True)


def test_orbax_checkpointer_retention_and_roundtrip(tmp_path):
    """Save/restore round-trip, latest-step selection, and max_to_keep
    retention of the orbax backend in isolation."""
    pytest.importorskip("orbax.checkpoint")  # optional [orbax] extra
    import jax
    import jax.numpy as jnp
    import optax
    from flax.training import train_state

    from hsimae_tpu.checkpoints.orbax_io import OrbaxCheckpointer

    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    st = train_state.TrainState.create(
        apply_fn=lambda x: x, params=params, tx=optax.adamw(1e-3))

    with OrbaxCheckpointer(str(tmp_path), max_to_keep=2) as ck:
        for step in (5, 11, 17):
            ck.save(step, st.replace(step=step))
        ck.wait()
        assert ck.latest_step() == 17
        restored = ck.restore_latest(st)
        assert int(restored.step) == 17
        assert np.allclose(restored.params["w"], np.arange(6).reshape(2, 3))
        # structure (incl. optimizer state) survives the round-trip
        assert (jax.tree_util.tree_structure(restored)
                == jax.tree_util.tree_structure(st))

    # retention: only max_to_keep newest steps remain on disk
    with OrbaxCheckpointer(str(tmp_path), max_to_keep=2) as ck2:
        assert ck2.latest_step() == 17
        kept = sorted(int(p.name) for p in tmp_path.iterdir()
                      if p.is_dir() and p.name.isdigit())
        assert kept == [11, 17]

    # empty directory -> None, not an error
    with OrbaxCheckpointer(str(tmp_path / "empty")) as ck3:
        assert ck3.restore_latest(st) is None
