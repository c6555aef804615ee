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
    """The whole block on one [TM, S, D] tile (shared by kernel + fallback)."""
    tm, s, d = x.shape
    hd = d // num_heads

    y = _ln(x, p.ln1_scale, p.ln1_bias).astype(compute_dtype)
    q = (y @ p.wq.astype(compute_dtype)) + p.bq.astype(compute_dtype)
    k = (y @ p.wk.astype(compute_dtype)) + p.bk.astype(compute_dtype)
    v = (y @ p.wv.astype(compute_dtype)) + p.bv.astype(compute_dtype)
    q = q.reshape(tm, s, num_heads, hd)
    k = k.reshape(tm, s, num_heads, hd)
    v = v.reshape(tm, s, num_heads, hd)
    logits = jnp.einsum("mqhd,mkhd->mhqk", q, k,
                        preferred_element_type=jnp.float32) * (hd**-0.5)
    attn = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
    o = jnp.einsum("mhqk,mkhd->mqhd", attn, v,
                   preferred_element_type=jnp.float32).astype(compute_dtype)
    o = o.reshape(tm, s, d)
    o = (o @ p.wo.astype(compute_dtype)) + p.bo.astype(compute_dtype)
    x = x + o.astype(x.dtype)

    y2 = _ln(x, p.ln2_scale, p.ln2_bias).astype(compute_dtype)
    h1 = (y2 @ p.w1.astype(compute_dtype)) + p.b1.astype(compute_dtype)
    h3 = (y2 @ p.w3.astype(compute_dtype)) + p.b3.astype(compute_dtype)
    h = jax.nn.silu(h1) * h3
    out = (h @ p.w2.astype(compute_dtype)) + p.b2.astype(compute_dtype)
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
    if not (use_pallas and FUSED_BLOCK_AVAILABLE and
            jax.devices()[0].platform == "tpu"):
        return _block_math(x, params, num_heads, x.dtype)

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
