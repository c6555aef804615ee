"""Shared primitives for the baseline model zoo.

The 10 compared methods (`/root/reference/Compared_Methods/`) share a few
building blocks: pre-norm residual transformer blocks with fused-qkv
attention, GELU feed-forward MLPs, and conv->BN->ReLU stems. These are
re-implemented once here, channels-last and MXU-shaped.

Conventions (all zoo models):
* input is ``[B, h, w, bands]`` channels-last (the torch originals take
  ``[B, bands, h, w]``),
* BatchNorm uses flax semantics: ``momentum = 1 - torch_momentum`` (torch
  default 0.1 -> 0.9 here), running stats in a ``batch_stats`` collection,
* dropout uses the ``'dropout'`` rng stream, active only when ``train=True``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MlpBlock(nn.Module):
    """Linear -> GELU -> Dropout -> Linear -> Dropout (the zoo's FeedForward)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.dim)(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class FusedAttention(nn.Module):
    """MHSA with a fused qkv projection (how the zoo models implement it,
    e.g. `/root/reference/Compared_Methods/SSFTT.py:60`). ``scale`` defaults
    to head_dim**-0.5; SSFTT quirk uses dim**-0.5 instead."""

    dim: int
    heads: int
    dim_head: Optional[int] = None
    dropout: float = 0.0
    qkv_bias: bool = True
    scale: Optional[float] = None
    out_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, _ = x.shape
        hd = self.dim_head or self.dim // self.heads
        inner = hd * self.heads
        qkv = nn.Dense(inner * 3, use_bias=self.qkv_bias, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, self.heads, hd), 3, axis=2)
        q, k, v = (t.squeeze(2) for t in (q, k, v))
        scale = self.scale if self.scale is not None else hd**-0.5
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, inner)
        out = nn.Dense(self.out_dim or self.dim, name="proj")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class TransformerEncoder(nn.Module):
    """depth x (x + attn(ln x); x + mlp(ln x))."""

    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dim_head: Optional[int] = None
    dropout: float = 0.0
    attn_scale: Optional[float] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            y = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(x)
            x = x + FusedAttention(
                self.dim, self.heads, self.dim_head, self.dropout,
                scale=self.attn_scale, name=f"attn_{i}",
            )(y, train)
            y = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(x)
            x = x + MlpBlock(self.dim, self.mlp_dim, self.dropout, name=f"mlp_{i}")(y, train)
        return x


def conv_bn_relu(
    x,
    features: int,
    kernel: Sequence[int],
    strides: Sequence[int] = None,
    padding="VALID",
    train: bool = False,
    name: str = "conv",
    eps: float = 1e-5,
    relu: bool = True,
):
    """nn.Conv -> BatchNorm -> ReLU, channels-last over any spatial rank."""
    x = nn.Conv(features, tuple(kernel), strides=tuple(strides) if strides else None,
                padding=padding, name=name)(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=eps,
                     name=f"{name}_bn")(x)
    return nn.relu(x) if relu else x


def torch_chw_to_hwc(x: jax.Array) -> jax.Array:
    """[B, bands, h, w] -> [B, h, w, bands] (for parity tests only)."""
    return jnp.transpose(x, (0, 2, 3, 1))
