"""Transformer primitives (flax.linen), shaped for the MXU.

Functional counterparts of the reference's primitives
(`/root/reference/Models.py:104-306`), with TPU-first choices:

* PatchEmbed is a single matmul: a Conv3d whose kernel == stride is a
  tokenizing reshape followed by a dense projection (`Models.py:146-158`),
  so it runs on the MXU with zero im2col work.
* Attention keeps the reference's separate q/k/v projections (checkpoint
  layout, `Models.py:180-182`) and computes softmax in f32 while matmuls run
  in the configured compute dtype (bf16 on TPU).
* SwiGLU preserves the reference's hidden-dim rounding quirk where the Block
  passes ``mlp_ratio`` as the round-up multiple (`Models.py:225,301`).
* DropPath is a per-sample bernoulli scale, applied via an explicit rng
  stream instead of module training state (`Models.py:235-263`).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


def swiglu_hidden_dim(dim: int, mlp_ratio: float = 4.0) -> int:
    """hidden = multiple_of * ceil(2 * (dim * ratio) / 3 / multiple_of) with
    multiple_of == int(mlp_ratio) — the reference's rounding quirk."""
    hidden = int(dim * mlp_ratio)
    multiple_of = int(mlp_ratio)
    return int(multiple_of * ((2 * hidden // 3 + multiple_of - 1) // multiple_of))


class PatchEmbed(nn.Module):
    """[N, H, W, bands] -> [N, T, L, C] token grid.

    Channels-last input; features of one token are the patch pixels in
    (b_patch, p_row, p_col) order, matching the torch Conv3d weight layout
    ``[C, 1, b_patch, p, p]`` so converted checkpoints are a pure reshape.
    """

    embed_dim: int
    patch_size: int
    b_patch_size: int
    dtype: jnp.dtype = jnp.float32
    trunc_init: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, hh, ww, bands = x.shape
        p, u = self.patch_size, self.b_patch_size
        assert hh % p == 0 and ww % p == 0 and bands % u == 0
        h, w, t = hh // p, ww // p, bands // u
        # tokenize: [N, h, p, w, q, t, u] -> [N, t, h, w, u, p, q]
        x = x.reshape(n, h, p, w, p, t, u)
        x = x.transpose(0, 5, 1, 3, 6, 2, 4)
        x = x.reshape(n, t, h * w, u * p * p)
        # torch.nn.init.trunc_normal_(w) with default std=1 — the reference's
        # patch-proj init quirk under trunc_init (`Models.py:438-439`)
        init = trunc_normal_init(1.0) if self.trunc_init else nn.initializers.xavier_uniform()
        return nn.Dense(
            self.embed_dim,
            kernel_init=init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj",
        )(x)


class Attention(nn.Module):
    """MHSA with separate q/k/v projections and optional additive bias."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = trunc_normal_init(0.02)

    @nn.compact
    def __call__(self, x: jax.Array, attn_bias: Optional[jax.Array] = None) -> jax.Array:
        n, s, c = x.shape
        h = self.num_heads
        hd = c // h
        dense = functools.partial(
            nn.Dense,
            self.dim,
            use_bias=self.qkv_bias,
            kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )
        q = dense(name="q")(x).reshape(n, s, h, hd)
        k = dense(name="k")(x).reshape(n, s, h, hd)
        v = dense(name="v")(x).reshape(n, s, h, hd)

        scale = hd**-0.5
        attn = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
        if attn_bias is not None:
            attn = attn + attn_bias
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, s, c)
        return nn.Dense(
            self.dim,
            use_bias=True,
            kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj",
        )(out)


class SwiGLU(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = trunc_normal_init(0.02)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = swiglu_hidden_dim(self.dim, self.mlp_ratio)
        dense = functools.partial(
            nn.Dense,
            use_bias=True,
            kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )
        x1 = dense(hidden, name="w1")(x)
        x3 = dense(hidden, name="w3")(x)
        return dense(self.dim, name="w2")(nn.silu(x1) * x3)


def drop_path(x: jax.Array, rate: float, rng: Optional[jax.Array], train: bool) -> jax.Array:
    """Stochastic depth: per-sample residual-branch dropout."""
    if rate == 0.0 or not train or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Block(nn.Module):
    """Pre-LN transformer block: x + dp(attn(ln x)); x + dp(swiglu(ln x)).

    LayerNorm runs in f32 for stability; matmuls in ``dtype``.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = trunc_normal_init(0.02)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def dp(y):
            if self.drop_path_rate > 0.0 and train:
                rng = self.make_rng("droppath")
                return drop_path(y, self.drop_path_rate, rng, train)
            return y

        # torch nn.LayerNorm default eps (the reference's norm_layer default)
        ln = functools.partial(nn.LayerNorm, epsilon=1e-5, dtype=jnp.float32)
        y = Attention(
            self.dim,
            self.num_heads,
            qkv_bias=self.qkv_bias,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            name="attn",
        )(ln(name="norm1")(x).astype(self.dtype))
        x = x + dp(y)
        y = SwiGLU(
            self.dim,
            self.mlp_ratio,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            name="mlp",
        )(ln(name="norm2")(x).astype(self.dtype))
        return x + dp(y)
