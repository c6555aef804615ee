"""DCTN: multiscale 3-D / grouped-2-D patch embedding (MDCP) + EISA
attention-permutator stages + parallel conv path, concat-fused head.

Behavioral re-implementation of
`/root/reference/Compared_Methods/DCTN.py:244-348`. Channels-last.

Notes / reconciliations:
* ``AdaptiveAvgPool3d`` is realized as per-axis pooling MATRICES (precomputed
  torch-bin weights, applied as matmuls — MXU-friendly, exact).
* The original's composite head concatenates the conv path (7x7), the token
  path (3x3 after the stage-1 transition) and the downsampled embedding
  (3x3) — shapes that cannot concat as written (`DCTN.py:344`, latent bug for
  the published 15x15-patch configs). Here all three are adaptively pooled
  to the token grid before the 1x1 ConvEnd; this is the minimal consistent
  reading of the architecture and is documented as a deviation.
* PermutatorBlock norm = GroupNorm(16 groups; 8 when dim==440)
  (`DCTN.py:196-200`).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Torch AdaptiveAvgPool bin weights as a [n_in, n_out] matrix."""
    m = np.zeros((n_in, n_out), np.float32)
    for o in range(n_out):
        lo = (o * n_in) // n_out
        hi = int(math.ceil((o + 1) * n_in / n_out))
        m[lo:hi, o] = 1.0 / (hi - lo)
    return m


def adaptive_avg_pool(x: jax.Array, axes: Sequence[int], sizes: Sequence[int]) -> jax.Array:
    """Exact torch-style adaptive average pooling via per-axis matmuls."""
    for ax, size in zip(axes, sizes):
        if x.shape[ax] == size:
            continue
        mat = jnp.asarray(_adaptive_pool_matrix(x.shape[ax], size))
        x = jnp.tensordot(x, mat, axes=([ax], [0]))
        x = jnp.moveaxis(x, -1, ax)
    return x


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, name=name)


class Add2D(nn.Module):
    """Grouped 3x3 + grouped 5x5 vs 1x1 shortcut, BN everywhere (`:177-192`)."""

    features: int
    groups: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.relu(_bn(train, "bn1")(nn.Conv(
            self.features, (3, 3), padding=1,
            feature_group_count=self.groups, name="conv1")(x)))
        y = _bn(train, "bn2")(nn.Conv(
            self.features, (5, 5), padding=2,
            feature_group_count=self.groups, name="conv2")(y))
        s = _bn(train, "bn3")(nn.Conv(self.features, (1, 1), name="conv3")(x))
        return nn.relu(s + y)


class MDCP(nn.Module):
    """Multiscale dual-path patch embed (`:126-174`)."""

    bands: int
    embed_dim: int
    groups: int
    groups_width: int
    pool_depth: int  # 40 (or 55 for Salinas)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, h, w, bands]
        b, h, w, c = x.shape
        new_bands = math.ceil(self.bands / self.groups) * self.groups
        pad = new_bands - self.bands
        # replication pad at the end of the band axis (`:156`)
        x1 = jnp.concatenate([x] + ([jnp.repeat(x[..., -1:], pad, -1)] if pad else []), -1)
        x1 = nn.relu(_bn(train, "bn_1")(nn.Conv(
            self.groups * self.groups_width, (1, 1),
            feature_group_count=self.groups, name="conv_1")(x1)))
        x1 = Add2D(self.groups * self.groups_width, self.groups, name="add2d")(x1, train)

        # 3-D path over (bands, h, w) with feature dim 1
        y = jnp.transpose(x, (0, 3, 1, 2))[..., None]  # [B, s, h, w, 1]
        y = nn.Conv(4, (11, 7, 7), padding=((0, 0), (3, 3), (3, 3)), name="proj")(y)
        y = nn.Conv(8, (9, 5, 5), padding=((0, 0), (2, 2), (2, 2)), name="proj2")(y)
        y = adaptive_avg_pool(y, (1, 2, 3), (self.pool_depth, 15, 15))
        y = _bn(train, "bn")(y)
        bb, s, hh, ww, cc = y.shape
        # c-major fold: the reference's reshape(B, D*H, W, C) names the
        # CHANNEL axis "D" ([B, 8, 40, 15, 15]), so feature = channel*40 + d
        # — which is also where embed_dim 320 = 8*40 comes from
        # (`DCTN.py:166-170`)
        y = jnp.transpose(y, (0, 2, 3, 4, 1)).reshape(bb, hh, ww, cc * s)

        # weighted fusion; align conv path to the pooled grid (`:168-172`)
        x1 = adaptive_avg_pool(x1, (1, 2), (hh, ww))
        wts = self.param("weights", nn.initializers.ones, (2,))
        z = y * wts[0] + x1 * wts[1]
        return nn.Conv(self.embed_dim, (3, 3), strides=(2, 2), padding="VALID",
                       name="down_sample")(z)


class FFNConv(nn.Module):
    """1x1 -> GELU -> depthwise 3x3 -> GELU -> 1x1, all bias-free (`:9-25`)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        y = nn.gelu(nn.Conv(self.hidden, (1, 1), use_bias=False, name="conv1")(x),
                    approximate=False)
        y = nn.gelu(nn.Conv(self.hidden, (3, 3), padding=1, use_bias=False,
                            feature_group_count=self.hidden, name="proj1")(y),
                    approximate=False)
        return nn.Conv(self.dim, (1, 1), use_bias=False, name="conv2")(y)


class EISA(nn.Module):
    """Efficient interactive self-attention: sigmoid-gated H / W / spectral
    branches mixed by tiny 1-D convs (`:28-123`)."""

    dim: int
    spatial: int  # H (= W) of the token grid this stage runs at

    @nn.compact
    def __call__(self, x, train: bool = False):
        add = x
        b, hh, ww, c = x.shape
        # bias flags mirror the reference's qkv_bias=False plumbing: layers
        # taking `bias=qkv_bias` are bias-free, the *2 convs keep their
        # default bias (`DCTN.py:33-61,249`)
        conv1d = lambda feats, k, name, bias: nn.Conv(
            feats, (k,), padding=k // 2, use_bias=bias, name=name)

        # Height branch
        hmap = nn.gelu(nn.Conv(c, (1, 1), use_bias=False, name="mlp_h")(x),
                       approximate=False)  # [B,H,W,C]
        h2 = hmap.mean(axis=(2, 3))[:, :, None]  # [B, H, 1] pooled over W,C
        h3 = nn.sigmoid(conv1d(1, 1, "convH", False)(h2))
        h3 = nn.sigmoid(conv1d(1, 3, "convH2", True)(h3))  # [B, H, 1]
        h_out = hmap * h3[:, :, None, :]  # scale per row

        # Width branch (gate mixes H and W stats)
        wmap = nn.gelu(nn.Conv(c, (1, 1), use_bias=False, name="mlp_w")(x),
                       approximate=False)
        w2 = wmap.mean(axis=(1, 3))[:, :, None]  # [B, W, 1]
        mix = jnp.concatenate([h2, w2], axis=-1)  # [B, H, 2] (H == W)
        mix = nn.sigmoid(conv1d(1, 1, "mix_hw", False)(mix))
        mix = nn.sigmoid(conv1d(1, 3, "mix_hw2", True)(mix))
        w_out = wmap * mix[:, None, :, :]  # scale per column

        # Spectral branch (gate mixes H, W and channel stats)
        smap = nn.gelu(nn.Conv(c, (1, 1), use_bias=False, name="mlp_s")(x),
                       approximate=False)
        s1 = smap.mean(axis=(1, 2))[:, :, None]  # [B, C, 1]
        hproj = nn.Dense(c, name="linearH")(h2[:, :, 0])[:, :, None]  # [B,C,1] via [B,H]->C
        wproj = nn.Dense(c, name="linearW")(w2[:, :, 0])[:, :, None]
        mixs = jnp.concatenate([hproj, wproj, s1], axis=-1)  # [B, C, 3]
        mixs = nn.sigmoid(conv1d(1, 1, "mix_hws", False)(mixs))
        mixs = nn.sigmoid(conv1d(1, 3, "mix_hws2", True)(mixs))  # [B, C, 1]
        s_out = smap * mixs[:, None, None, :, 0]

        z = jnp.concatenate([h_out, w_out, s_out], axis=-1)
        z = nn.Conv(self.dim, (1, 1), use_bias=False, name="mix_all")(z)
        z = nn.Dense(self.dim, name="proj")(z)
        wts = self.param("weights", nn.initializers.ones, (2,))
        return z * wts[0] + add * wts[1]


class PermutatorBlock(nn.Module):
    dim: int
    spatial: int
    mlp_ratio: float = 3.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = 8 if self.dim == 440 else 16
        # reference quirk (`DCTN.py:215-223`): the block REPLACES x with the
        # normed tensor, so the residual base is norm(x), not x
        x = nn.GroupNorm(num_groups=groups, epsilon=1e-5, name="norm1")(x)
        x = x + EISA(self.dim, self.spatial, name="attn")(x, train)
        x = nn.GroupNorm(num_groups=groups, epsilon=1e-5, name="norm2")(x)
        return x + FFNConv(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(x)


class DCTN(nn.Module):
    layers: Tuple[int, ...]
    bands: int
    num_classes: int
    embed_dims: Tuple[int, ...]
    transitions: Tuple[bool, ...]
    segment_dim: Tuple[int, ...]
    mlp_ratios: Tuple[float, ...]
    groups: int = 5
    groups_width: int = 64
    pool_depth: int = 40

    @nn.compact
    def __call__(self, x, train: bool = False):
        emb = MDCP(self.bands, self.embed_dims[0], self.groups,
                   self.groups_width, self.pool_depth, name="patch_embed")(x, train)
        z = emb
        spatial = z.shape[1]
        for i, n_blocks in enumerate(self.layers):
            for j in range(n_blocks):
                z = PermutatorBlock(self.embed_dims[i], spatial,
                                    self.mlp_ratios[i],
                                    name=f"block_{i}_{j}")(z, train)
            if i < len(self.layers) - 1 and (
                self.transitions[i] or self.embed_dims[i] != self.embed_dims[i + 1]
            ):
                ps = 2 if self.transitions[i] else 1
                z = nn.Conv(self.embed_dims[i + 1], (ps, ps), strides=(ps, ps),
                            padding="VALID", name=f"downsample_{i}")(z)
                spatial = z.shape[1]

        # parallel conv path from the embedding (`:338-343`)
        act = lambda v: nn.gelu(v, approximate=False)  # torch nn.GELU is exact erf
        c = act(_bn(train, "bn2")(nn.Conv(128, (3, 3), padding=1, name="conv2")(emb)))
        c = act(_bn(train, "bn2_2")(nn.Conv(128, (3, 3), padding=1,
                                            feature_group_count=128, name="conv2_2")(c)))
        c = act(_bn(train, "bn3")(nn.Conv(256, (3, 3), padding=1, name="conv3")(c)))
        c = nn.max_pool(c, (2, 2), strides=(2, 2))
        c = act(_bn(train, "bn3_2")(nn.Conv(256, (3, 3), padding=1, name="conv3_2")(c)))
        c = act(_bn(train, "bn4")(nn.Conv(self.embed_dims[-1], (3, 3), padding=1,
                                          name="conv4")(c)))
        c = act(_bn(train, "bn4_2")(nn.Conv(self.embed_dims[-1], (3, 3), padding=1,
                                            feature_group_count=self.embed_dims[-1],
                                            name="conv4_2")(c)))
        e = nn.Conv(512, (2, 2), strides=(2, 2), padding="VALID", name="down_sample")(emb)

        # align all three to the token grid (see module docstring)
        hw = z.shape[1:3]
        c = adaptive_avg_pool(c, (1, 2), hw)
        e = adaptive_avg_pool(e, (1, 2), hw)
        z = nn.Conv(self.embed_dims[-1], (1, 1), name="conv_end")(
            jnp.concatenate([c, z, e], axis=-1))
        z = z.reshape(z.shape[0], -1, z.shape[-1])
        z = nn.LayerNorm(epsilon=1e-5, name="norm")(z)
        return nn.Dense(self.num_classes, name="head")(z.mean(axis=1))
