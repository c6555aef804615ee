"""Tests for hsimae_tpu.ops: fused block math and on-device metrics.

Honest-coverage note (ops/fused_block.py STATUS): on CPU,
``fused_encoder_block`` short-circuits to its pure-XLA ``_block_math``
fallback, so the fused-block tests below pin the FALLBACK math and the
``cfg.use_pallas`` model wiring — they never execute a ``pallas_call``.
The kernel body itself is TPU-manual-only (retired from the default path
by measurement; RESULTS.md round 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsimae_tpu.models.layers import Block
from hsimae_tpu.ops.fused_block import BlockParams, fused_encoder_block, params_from_flax
from hsimae_tpu.ops.metrics_ops import confusion_matrix_op, update_confusion
from hsimae_tpu.utils.metrics import confusion_matrix


def test_fused_block_matches_flax_block():
    """Fallback-math parity (see module docstring: no pallas_call on CPU)."""
    dim, heads, s, m = 64, 4, 9, 32
    block = Block(dim, heads)
    x = jax.random.normal(jax.random.PRNGKey(0), (m, s, dim), jnp.float32)
    params = block.init(jax.random.PRNGKey(1), x, False)["params"]
    want = block.apply({"params": params}, x, False)
    got = fused_encoder_block(x, params_from_flax(params), heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_block_sliced_matches_unsliced():
    """Batches larger than one tile are applied as a sequence of <=tile_m
    single-program calls; the result must equal the one-shot application."""
    from hsimae_tpu.ops.fused_block import fused_block_sliced

    dim, heads, s, m = 64, 4, 9, 70  # 70 = 2 full 32-tiles + remainder 6
    block = Block(dim, heads)
    x = jax.random.normal(jax.random.PRNGKey(0), (m, s, dim), jnp.float32)
    params = block.init(jax.random.PRNGKey(1), x, False)["params"]
    p = params_from_flax(params)
    want = fused_encoder_block(x, p, heads)
    got = fused_block_sliced(x, p, heads, tile_m=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype,rtol,atol", [
    (jnp.float32, 2e-5, 2e-5),
    # bf16 compute: the fused path rounds the residual stream to bf16 once on
    # entry while the flax path keeps the f32 stream (documented divergence,
    # hsimae._run_blocks); bf16 has ~3 decimal digits -> tolerance 5e-2.
    (jnp.bfloat16, 5e-2, 5e-2),
], ids=["f32", "bf16"])
def test_model_use_pallas_inference_path_matches_default(dtype, rtol, atol):
    """cfg.use_pallas routes inference blocks through the fused path (XLA
    fallback off-TPU); logits must match the flax-module path."""
    from hsimae_tpu.config import preset
    from hsimae_tpu.models.hsimae import HSIMAE, build_dual_vit, init_model

    cfg = preset("HSIMAE-S", depth=4, s_depth=2, decoder_depth=1,
                 embed_dim=64, num_heads=4, decoder_dim=32,
                 decoder_num_heads=4, compute_dtype=dtype)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, cfg.img_size, cfg.img_size,
                                                  cfg.bands), jnp.float32)
    m0 = build_dual_vit(cfg, 5)
    params = init_model(m0, seed=0)["params"]
    base = m0.apply({"params": params}, x, False, method=HSIMAE.classify)
    m1 = build_dual_vit(cfg.replace(use_pallas=True), 5)
    fused = m1.apply({"params": params}, x, False, method=HSIMAE.classify)
    np.testing.assert_allclose(np.asarray(fused, np.float32),
                               np.asarray(base, np.float32),
                               rtol=rtol, atol=atol)


def test_confusion_matrix_op_matches_numpy():
    rng = np.random.default_rng(0)
    y, p = rng.integers(0, 5, 200), rng.integers(0, 5, 200)
    got = np.asarray(confusion_matrix_op(jnp.asarray(y), jnp.asarray(p), 5))
    want = confusion_matrix(y, p, 5)
    np.testing.assert_array_equal(got, want)


def test_update_confusion_accumulates_with_weights():
    cm = jnp.zeros((3, 3))
    y = jnp.asarray([0, 1, 2, 2])
    p = jnp.asarray([0, 1, 1, 2])
    w = jnp.asarray([1.0, 1.0, 0.0, 1.0])  # third row masked out
    cm = update_confusion(cm, y, p, w)
    want = np.zeros((3, 3)); want[0, 0] = 1; want[1, 1] = 1; want[2, 2] = 1
    np.testing.assert_array_equal(np.asarray(cm), want)


def test_device_confusion_metrics_equal_host_path():
    """The production eval path (finetune val loop / scene eval) accumulates
    a raw [C, C] confusion on device and derives metrics with
    metrics_from_raw_confusion; it must agree with the per-sample host path
    (classification_metrics) — incl. background rows (excluded) and
    background predictions (always-wrong bucket)."""
    from hsimae_tpu.utils.metrics import (
        classification_metrics,
        metrics_from_raw_confusion,
    )

    rng = np.random.default_rng(7)
    for trial in range(5):
        c = int(rng.integers(3, 9))  # classes incl. background 0
        y = rng.integers(0, c, 500)
        p = rng.integers(0, c, 500)  # predictions may hit background 0
        cm = np.asarray(confusion_matrix_op(jnp.asarray(y), jnp.asarray(p), c))
        got = metrics_from_raw_confusion(cm)
        want = classification_metrics(y, p)
        assert np.isclose(got.oa, want.oa), (trial, got, want)
        assert np.isclose(got.aa, want.aa), (trial, got, want)
        assert np.isclose(got.kappa, want.kappa), (trial, got, want)
        n = len(want.per_class)
        np.testing.assert_allclose(got.per_class[:n], want.per_class)
