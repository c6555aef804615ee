"""GSC-ViT: groupwise separable convolution + groupwise pixel/patch
self-attention stages.

Behavioral re-implementation of
`/root/reference/Compared_Methods/GSCViT.py:248-444`. Channels-last. Quirks
preserved: the stem applies BN+ReLU twice (SpectralCalibration has its own,
then bn_1/relu_1, `GSCViT.py:297-300`); ``conv_last`` exists in the original
but is never called — omitted here.

GSSA (`GSCViT.py:128-219`): the map is tiled into ``gss x gss`` spatial
groups, each group gets a learned group token; attention runs within each
group (token included); then the per-group tokens attend to each other and
their attention weights re-aggregate the grouped feature maps across groups.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, name=name)


class GSC(nn.Module):
    """Grouped pointwise conv -> grouped 3x3 conv -> BN -> ReLU (`:115-126`)."""

    dim_out: int
    padding: int
    num_groups: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.dim_out, (1, 1), feature_group_count=self.num_groups,
                    name="gpwc")(x)
        x = nn.Conv(self.dim_out, (3, 3), padding=self.padding,
                    feature_group_count=self.num_groups, name="gc")(x)
        return nn.relu(_bn(train, "bn")(x))


class GSSA(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 16
    group_spatial_size: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, hh, ww, c = x.shape
        g = self.group_spatial_size
        assert hh % g == 0 and ww % g == 0
        nx, ny = hh // g, ww // g
        n_groups = nx * ny
        h, d = self.heads, self.dim_head
        inner = h * d

        # tile into groups: [(b nx ny), g*g, C]
        xg = x.reshape(b, nx, g, ny, g, c).transpose(0, 1, 3, 2, 4, 5)
        xg = xg.reshape(b * n_groups, g * g, c)

        tok = self.param("group_token", nn.initializers.normal(1.0), (c,))
        xg = jnp.concatenate([jnp.tile(tok[None, None], (xg.shape[0], 1, 1)), xg], 1)

        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(xg)
        q, k, v = jnp.split(qkv.reshape(xg.shape[0], -1, 3, h, d), 3, axis=2)
        q, k, v = (t.squeeze(2).transpose(0, 2, 1, 3) for t in (q, k, v))
        attn = jax.nn.softmax((q * d**-0.5) @ k.transpose(0, 1, 3, 2), axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = attn @ v  # [bG, h, n+1, d]

        group_tok, fmap = out[:, :, 0], out[:, :, 1:]

        if n_groups > 1:
            # group tokens attend across groups (`:198-216`)
            gt = group_tok.reshape(b, n_groups, h, d).transpose(0, 2, 1, 3)  # [b,h,G,d]
            y = nn.LayerNorm(epsilon=1e-5, name="gt_norm")(gt)
            y = nn.gelu(y, approximate=False)
            # conv1d over (h*d) features per group — mixes heads (`:152-158`)
            y = y.transpose(0, 2, 1, 3).reshape(b, n_groups, h * d)
            y = nn.Dense(inner * 2, name="gt_qk")(y)
            y = y.reshape(b, n_groups, h, 2 * d).transpose(0, 2, 1, 3)
            wq, wk = jnp.split(y, 2, axis=-1)
            w_attn = jax.nn.softmax((wq * d**-0.5) @ wk.transpose(0, 1, 3, 2), -1)
            w_attn = nn.Dropout(self.dropout, deterministic=not train)(w_attn)
            fm = fmap.reshape(b, n_groups, h, g * g, d).transpose(0, 2, 1, 3, 4)
            fm = jnp.einsum("bhij,bhjnd->bhind", w_attn, fm)  # [b,h,G,gg,d]
            fmap = fm.transpose(0, 2, 1, 3, 4).reshape(b * n_groups, h, g * g, d)

        # reassemble to the map: [b, H, W, inner]
        fm = fmap.transpose(0, 2, 1, 3).reshape(b, nx, ny, g, g, inner)
        fm = fm.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, inner)
        fm = nn.Conv(self.dim, (1, 1), name="to_out")(fm)
        return nn.Dropout(self.dropout, deterministic=not train)(fm)


class GSCViT(nn.Module):
    num_classes: int
    channels: int
    depth: Tuple[int, ...] = (1, 1, 1)
    heads: Tuple[int, ...] = (1, 1, 1)
    group_spatial_size: Sequence[int] = (4, 4, 4)
    padding: Sequence[int] = (1, 1, 1)
    dims: Tuple[int, ...] = (256, 128, 64)
    num_groups: Sequence[int] = (16, 16, 16)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem: spectral calibration + (second) BN/ReLU, both kept (`:297-300`)
        x = nn.Conv(256, (1, 1), name="sc_conv")(x)
        x = nn.relu(_bn(train, "sc_bn")(x))
        x = nn.relu(_bn(train, "bn_1")(x))

        # reference stage count: zip(dims[:-1], dims[1:]) — for the published
        # dims=(256, 128, 64) that is TWO stages (256->128, 128->64); the
        # stem's 256 channels feed the first stage directly (`GSCViT.py:264`)
        pairs = list(zip(self.dims[:-1], self.dims[1:]))
        n_stages = len(pairs)
        for i, (din, dout) in enumerate(pairs):
            x = GSC(dout, self.padding[i], self.num_groups[i], name=f"gsc_{i}")(x, train)
            y = x
            for j in range(self.depth[i]):
                z = nn.LayerNorm(epsilon=1e-5, name=f"prenorm_{i}_{j}")(x)
                x = GSSA(dout, self.heads[i], 16, self.group_spatial_size[i],
                         self.dropout, name=f"gssa_{i}_{j}")(z, train)
            # reference quirk: is_last compares against len(depth) (3) while
            # zip(dims[:-1], dims[1:]) yields only 2 stages, so norm_output
            # is True for EVERY stage actually built (`GSCViT.py:255,264-275`)
            if i != len(self.depth) - 1:
                x = nn.LayerNorm(epsilon=1e-5, name=f"postnorm_{i}")(x)
            x = nn.Conv(dout, (1, 1), name=f"pw_{i}")(x) + y
            x = nn.relu(_bn(train, f"stage_bn_{i}")(x))

        x = x.mean(axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-5, name="head_norm")(x)
        return nn.Dense(self.num_classes, name="head")(x)
