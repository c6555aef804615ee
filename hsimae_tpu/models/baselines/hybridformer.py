"""HybridFormer: conv feature-extraction stem + parallel multi-patch-size
transformer branches with conv-FFN and joint spatial+spectral attention,
fused by a weighted head.

Behavioral re-implementation of
`/root/reference/Compared_Methods/HybridFormer.py:185-226`. Quirks preserved:

* the conv FFN adds its own residual AND the transformer adds another
  (`HybridFormer.py:73-76,166`),
* attention maps pass through a 3x3 conv over the head axis; a second
  "spectral" attention over transposed tokens right-multiplies the block
  output (`HybridFormer.py:127-144`),
* branch weights are softmax(ones) = uniform (`HybridFormer.py:221-226`),
* the per-branch cls_token exists but is unused by the forward.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bn(train, name, eps=1e-5):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=eps, name=name)


class OurFE(nn.Module):
    """Three chained 1x1 conv+BN+ReLU; concat -> 3x3 conv (`:15-42`)."""

    channel: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        o1 = nn.relu(_bn(train, "bn1")(nn.Conv(self.channel, (1, 1), name="conv1")(x)))
        o2 = nn.relu(_bn(train, "bn2")(nn.Conv(self.channel, (1, 1), name="conv2")(o1)))
        o3 = nn.relu(_bn(train, "bn3")(nn.Conv(self.channel, (1, 1), name="conv3")(o2)))
        cat = jnp.concatenate([o1, o2, o3], axis=-1)
        return nn.relu(_bn(train, "bn4")(
            nn.Conv(self.channel, (3, 3), padding=1, name="out_conv")(cat)))


class ConvFFN(nn.Module):
    """Depthwise 3x3 -> BN -> 1x1 to 512 -> GELU -> 1x1 to dim -> GELU, on the
    token grid, with internal residual (`:58-76`)."""

    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        w = int(math.sqrt(n))
        # tokens are column-major (t = col*S + row, see SubNet), so this grid
        # has axes (col, row) — exactly the reference's 'b (w h) c -> b c w h'
        y = x.reshape(b, w, w, c)
        y = nn.Conv(c, (3, 3), padding=1, feature_group_count=c, name="dw")(y)
        y = nn.Conv(256, (1, 1), name="pw")(y)
        y = _bn(train, "bn")(y)
        y = nn.gelu(nn.Conv(512, (1, 1), name="fc1")(y), approximate=False)
        y = nn.gelu(nn.Conv(self.dim, (1, 1), name="fc2")(y), approximate=False)
        return x + y.reshape(b, n, c)


class HybridAttention(nn.Module):
    dim: int
    heads: int
    dim_head: int
    num_patches: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, _ = x.shape
        h, hd = self.heads, self.dim_head
        inner = h * hd
        qkv = nn.Dense(inner * 3, use_bias=False, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, h, hd), 3, axis=2)
        q, k, v = (t.squeeze(2).transpose(0, 2, 1, 3) for t in (q, k, v))
        scale = hd**-0.5
        attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) * scale, axis=-1)
        # 3x3 conv over the (n, n) map, heads as features (`:135`)
        a = attn.transpose(0, 2, 3, 1)  # [b, n, n, heads]
        a = nn.Conv(h, (3, 3), padding=1, name="spatial_conv")(a)
        attn = a.transpose(0, 3, 1, 2)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, name="proj")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)

        # spectral attention over transposed tokens (`:138-144`)
        xt = jnp.swapaxes(x, 1, 2)  # [b, dim, n]
        qkv_s = nn.Dense(self.num_patches * 3, use_bias=False, name="qkv_spec")(xt)
        qs, ks, vs = jnp.split(qkv_s, 3, axis=-1)
        dots = qs @ jnp.swapaxes(ks, 1, 2) * scale  # [b, dim, dim]
        a2 = jax.nn.softmax(dots, axis=-1)[..., None]  # [b, dim, dim, 1]
        a2 = nn.Conv(1, (3, 3), padding=1, name="spectral_conv")(a2)[..., 0]
        return out @ a2


class SubNet(nn.Module):
    dim: int
    patch: int
    num_patches: int
    depth: int
    heads: int
    dim_head: int
    dropout: float
    emb_dropout: float

    @nn.compact
    def __call__(self, img, train: bool = False):
        # depthwise patchify (is_fe=True: depthwise only, `:171-175`)
        y = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    feature_group_count=self.dim, name="patch_dw")(img)
        b = y.shape[0]
        # column-major token flatten (t = col*S + row), matching the
        # reference's `Rearrange('b c w h -> b (h w) c')` (`:171-174`) so the
        # pos embedding, the 3x3 conv over attention maps, and the ConvFFN
        # grid all see the reference's token adjacency
        y = jnp.swapaxes(y, 1, 2).reshape(b, -1, self.dim)
        n = y.shape[1]
        pos = self.param("pos_embedding", nn.initializers.zeros,
                         (1, self.num_patches + 1, self.dim))
        y = y + pos[:, :n]
        y = nn.Dropout(self.emb_dropout, deterministic=not train)(y)
        for i in range(self.depth):
            z = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(y)
            y = HybridAttention(self.dim, self.heads, self.dim_head,
                                self.num_patches, self.dropout,
                                name=f"attn_{i}")(z, train) + y
            z = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(y)
            y = ConvFFN(self.dim, name=f"ffn_{i}")(z, train) + y
        return y


class HybridFormer(nn.Module):
    image_size: int
    patch_sizes: Tuple[int, ...]
    num_classes: int
    dim: int = 100
    depth: int = 2
    heads: int = 4
    dim_head: int = 64
    channels: int = 103
    dropout: float = 0.2
    emb_dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = OurFE(self.channels, name="ournet")(x, train)
        x = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        x = nn.Conv(self.dim, (1, 1), name="conv4")(x)

        res = 0.0
        wgt = 1.0 / len(self.patch_sizes)  # softmax(ones) (`:221`)
        for ps in self.patch_sizes:
            n = (int((self.image_size - ps) / ps) + 1) ** 2
            y = SubNet(self.dim, ps, n, self.depth, self.heads, self.dim_head,
                       self.dropout, self.emb_dropout, name=f"sub_{ps}")(x, train)
            y = y.reshape(y.shape[0], -1)
            y = nn.LayerNorm(epsilon=1e-5, name=f"head_norm_{ps}")(y)
            res = res + nn.Dense(self.num_classes, name=f"head_{ps}")(y) * wgt
        return res
