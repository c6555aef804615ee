"""Pallas TPU kernel: one fused pre-LN transformer block.

The HSIMAE workload is many tiny sequences (4/9/18/36 tokens, dim 64-256)
batched along the separable-branch axis (`SURVEY.md` §7: the Pallas win is
fusing whole blocks and keeping activations in VMEM, batching the (b·t)/(b·l)
layouts). One kernel program processes a tile of TM sequences end to end:

    y  = LayerNorm(x);  attn = softmax(q k^T / sqrt(hd)) v;  x += attn @ Wo
    y2 = LayerNorm(x);  x += W2(silu(W1 y2) * W3 y2)

All matmuls hit the MXU from VMEM; LN/softmax run in f32 on the VPU. The
sequence stays resident — zero HBM round-trips between the seven matmuls.

Use :func:`fused_encoder_block` (same math as ``models.layers.Block`` without
drop-path — pretraining's default) and gate it with
``FUSED_BLOCK_AVAILABLE``; a pure-XLA fallback keeps CPU tests green.

STATUS — retired from the default path, by measurement (SURVEY.md §7 step 6
says Pallas "where profiling justifies it"; it did not):

* XLA's own fused block runs at 0.31-0.66 ms/batch on the target chip —
  already at the hardware ceiling for these tiny sequences (RESULTS.md
  round 2 A/B), so the kernel has no throughput win to offer;
* the gridded ``pallas_call`` has NEVER compiled on this runtime (remote
  Mosaic compile exceeded 18 min); the shipped workaround lowers the grid to
  a **sequential** ``lax.map`` over <=256-row single-program calls, which is
  strictly slower than the XLA path;
* no custom VJP is defined, so the kernel is inference-only; training always
  uses XLA's fused backward.

CI consequence: on CPU (and whenever ``FUSED_BLOCK_AVAILABLE`` is false)
``fused_encoder_block`` short-circuits to :func:`_block_math` — the pure-XLA
reference — so the ``tests/test_ops.py`` parity tests exercise the FALLBACK
math and the model-path wiring, never a ``pallas_call``. The kernel body has
only been validated manually on the TPU. It stays in the tree as the
documented starting point if a future geometry (bigger dims/sequences) makes
a fused kernel worthwhile, gated behind the default-off
``ModelConfig.use_pallas``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

try:  # pallas is TPU/Mosaic-only at runtime; import lazily for CPU tests
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    FUSED_BLOCK_AVAILABLE = True
except Exception:  # pragma: no cover
    FUSED_BLOCK_AVAILABLE = False


class BlockParams(NamedTuple):
    """Weights of one Block in matmul layout ([in, out] kernels)."""

    ln1_scale: jax.Array  # [D]
    ln1_bias: jax.Array  # [D]
    wq: jax.Array  # [D, D]
    bq: jax.Array  # [D]
    wk: jax.Array
    bk: jax.Array
    wv: jax.Array
    bv: jax.Array
    wo: jax.Array
    bo: jax.Array
    ln2_scale: jax.Array
    ln2_bias: jax.Array
    w1: jax.Array  # [D, H]
    b1: jax.Array  # [H]
    w3: jax.Array  # [D, H]
    b3: jax.Array  # [H]
    w2: jax.Array  # [H, D]
    b2: jax.Array  # [D]


def params_from_flax(block_params: dict) -> BlockParams:
    """Extract a ``models.layers.Block`` param subtree into matmul layout."""
    a = block_params["attn"]
    m = block_params["mlp"]
    return BlockParams(
        ln1_scale=block_params["norm1"]["scale"],
        ln1_bias=block_params["norm1"]["bias"],
        wq=a["q"]["kernel"], bq=a["q"]["bias"],
        wk=a["k"]["kernel"], bk=a["k"]["bias"],
        wv=a["v"]["kernel"], bv=a["v"]["bias"],
        wo=a["proj"]["kernel"], bo=a["proj"]["bias"],
        ln2_scale=block_params["norm2"]["scale"],
        ln2_bias=block_params["norm2"]["bias"],
        w1=m["w1"]["kernel"], b1=m["w1"]["bias"],
        w3=m["w3"]["kernel"], b3=m["w3"]["bias"],
        w2=m["w2"]["kernel"], b2=m["w2"]["bias"],
    )


def _ln(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)) * scale + bias


def _block_math(x, p: BlockParams, num_heads: int, compute_dtype):
    """The whole block on one [TM, S, D] tile (shared by kernel + fallback).

    Every matmul accumulates in f32 (`preferred_element_type`) — the Mosaic
    MXU requires 32-bit accumulators for bf16 operands.
    """
    tm, s, d = x.shape
    hd = d // num_heads

    def mm(a, w, b, out_dtype=compute_dtype):
        out = jax.lax.dot_general(
            a.reshape(-1, a.shape[-1]), w.astype(compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (out + b.astype(jnp.float32)).astype(out_dtype).reshape(
            *a.shape[:-1], w.shape[-1])

    y = _ln(x, p.ln1_scale, p.ln1_bias).astype(compute_dtype)
    q = mm(y, p.wq, p.bq)  # [tm, s, d]
    k = mm(y, p.wk, p.bk)
    v = mm(y, p.wv, p.bv)
    # static per-head loop: Mosaic rejects both 2-batch-dim matmuls and the
    # [tm, s, h, hd] head transpose; last-axis slices avoid both
    outs = []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        logits = jax.lax.dot_general(
            q[:, :, sl], k[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * (hd**-0.5)  # [tm, s, s]
        attn = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
        outs.append(jax.lax.dot_general(
            attn, v[:, :, sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype))  # [tm, s, hd]
    o = jnp.concatenate(outs, axis=-1)
    o = mm(o, p.wo, p.bo)
    x = x + o.astype(x.dtype)

    y2 = _ln(x, p.ln2_scale, p.ln2_bias).astype(compute_dtype)
    # silu gate in f32: Mosaic rejects weak-typed scalar broadcasts into bf16
    h1 = mm(y2, p.w1, p.b1, out_dtype=jnp.float32)
    h3 = mm(y2, p.w3, p.b3, out_dtype=jnp.float32)
    h = (jax.nn.silu(h1) * h3).astype(compute_dtype)
    out = mm(h, p.w2, p.b2)
    return x + out.astype(x.dtype)


def _kernel(x_ref, *refs, num_heads: int, compute_dtype):
    out_ref = refs[-1]
    p = BlockParams(*[r[:] for r in refs[:-1]])
    out_ref[:] = _block_math(x_ref[:], p, num_heads, compute_dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "tile_m", "use_pallas"))
def fused_encoder_block(
    x: jax.Array,  # [M, S, D]
    params: BlockParams,
    num_heads: int,
    tile_m: int = 256,
    use_pallas: bool = True,
) -> jax.Array:
    """Apply one transformer block to [M, S, D] sequences."""
    m, s, d = x.shape
    # The current TPU runtime's remote compile helper crashes on GRIDDED
    # pallas_calls of this kernel (any BlockSpec with a grid; whole-array
    # single-program calls compile and validate fine — verified on hardware).
    # Until that infra bug clears, pallas runs only when one program covers
    # the whole batch; larger batches use the (already near-peak) XLA path.
    if not (use_pallas and FUSED_BLOCK_AVAILABLE and m <= tile_m and
            jax.devices()[0].platform == "tpu"):
        return _block_math(x, params, num_heads, x.dtype)

    # Mosaic requires 128-aligned lane dims for f32 intermediates: zero-pad
    # the SwiGLU hidden axis (silu(0)*0 = 0 and w2's padded rows are zero, so
    # the math is exact).
    hid = params.w1.shape[-1]
    pad = (-hid) % 128
    if pad:
        params = params._replace(
            w1=jnp.pad(params.w1, ((0, 0), (0, pad))),
            b1=jnp.pad(params.b1, (0, pad)),
            w3=jnp.pad(params.w3, ((0, 0), (0, pad))),
            b3=jnp.pad(params.b3, (0, pad)),
            w2=jnp.pad(params.w2, ((0, pad), (0, 0))),
        )

    tm = min(tile_m, m)
    grid = (pl.cdiv(m, tm),)
    weight_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(len(params))
    ]
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, compute_dtype=x.dtype),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((tm, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x, *params)


def fused_block_sliced(
    x: jax.Array,  # [M, S, D]
    params: BlockParams,
    num_heads: int,
    tile_m: int = 256,
) -> jax.Array:
    """Apply the fused block to an arbitrary-M batch via ``lax.map`` over
    ``tile_m``-row tiles — the workaround for the remote-compile helper's
    gridded-pallas crash (the mapped call has grid (1,)). The kernel is
    traced ONCE regardless of M (an unrolled host-side slice loop was
    measured to explode compile time at production batches: ~1000 call
    instances for HSIMAE-B at batch 2048). M is padded to a tile multiple
    with zero rows (LayerNorm of zeros is finite; padded rows are dropped).

    Cost note: ``lax.map`` lowers to a SEQUENTIAL scan over the tiles, so a
    large-M batch (e.g. the n*t rows of the separable branches at batch 2048)
    executes tiles serially — potentially slower than the XLA fallback it
    replaces. This is one reason ``ModelConfig.use_pallas`` defaults to False
    (the other: the remote Mosaic compile of the gridded kernel never
    finished on this runtime — RESULTS.md round-2 A/B); benchmark at
    production batch sizes before enabling the flag on a new runtime."""
    m = x.shape[0]
    if m <= tile_m:
        return fused_encoder_block(x, params, num_heads, tile_m)
    n_tiles = -(-m // tile_m)
    pad = n_tiles * tile_m - m
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], 0)
    tiles = x.reshape(n_tiles, tile_m, *x.shape[1:])
    out = jax.lax.map(
        lambda t: fused_encoder_block(t, params, num_heads, tile_m), tiles
    )
    out = out.reshape(n_tiles * tile_m, *x.shape[1:])
    return out[:m] if pad else out
