"""HiT: dynamic 3-D conv patch embedding + permute-MLP ("Vision Permutator")
stages.

Behavioral re-implementation of `/root/reference/Compared_Methods/HiT.py:312-384`
(original xiachangxue/DeepHyperX). Note: the reference file is present but
never instantiated by the benchmark harness (DCTN is its evolution); included
for inventory parity with the same defaults.

* PatchEmbed: two ``Dynamic_conv3d`` layers — per-sample mixtures of K=4
  kernels weighted by a softmax over a squeeze-excite-style attention
  (`HiT.py:16-40,82-126`), with an ``nattention3d`` sigmoid gate on the input.
  The (channels, depth) axes of the output fold into the token feature dim.
* Stages of PermutatorBlocks whose token mixer is ConvPermuteMLP (depthwise
  (1,3)/(3,1)/1x1 conv branches, softmax-reweighted) by default, or
  WeightedPermuteMLP (segment-wise H/W/C linear permutes).
* LayerNorm + mean pool + linear head.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class DynamicConv3d(nn.Module):
    """K-kernel dynamic conv over (s, h, w) with feature dim last."""

    in_planes: int
    out_planes: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: int = 1
    K: int = 4
    temperature: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, s, h, w, Cin]
        b = x.shape[0]
        # kernel-attention (`HiT.py:16-40`)
        hidden = int(self.in_planes * 4) + 1
        g = x.mean(axis=(1, 2, 3))  # [B, Cin]
        g = nn.relu(nn.Dense(hidden, use_bias=False, name="fc1")(g))
        att = jax.nn.softmax(nn.Dense(self.K, use_bias=False, name="fc2")(g)
                             / self.temperature, axis=-1)  # [B, K]

        # local gate (`HiT.py:43-79`): pool spatial, conv along spectral axis
        y = x.mean(axis=(2, 3), keepdims=True)  # [B, s, 1, 1, Cin]
        k4 = self.in_planes * 4
        y = nn.Conv(k4, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)), name="a")(y)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                 epsilon=1e-3, name="bn")(y))
        y = nn.Conv(self.in_planes, (1, 1, 1), use_bias=False,
                    kernel_init=nn.initializers.zeros, name="b")(y)
        x = x * nn.sigmoid(y)

        # per-sample kernel mixture, applied with vmap (`HiT.py:107-121`)
        kd, kh, kw = self.kernel
        bank = self.param(
            "weight", nn.initializers.normal(1.0),
            (self.K, kd, kh, kw, self.in_planes, self.out_planes),
        )
        agg = jnp.einsum("bk,kdhwio->bdhwio", att, bank)
        pad = [(self.padding, self.padding)] * 3

        def conv_one(xi, wi):
            return jax.lax.conv_general_dilated(
                xi[None], wi, window_strides=self.stride, padding=pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )[0]

        return jax.vmap(conv_one)(x, agg)


class Mlp(nn.Module):
    dim: int
    hidden: int
    out: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.gelu(nn.Dense(self.hidden)(x), approximate=False)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(self.out)(x)
        return nn.Dropout(self.drop, deterministic=not train)(x)


class ConvPermuteMLP(nn.Module):
    """Depthwise (1,3) / (3,1) / pointwise branches, softmax-reweighted
    (`HiT.py:200-239`)."""

    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, hh, ww, c = x.shape
        # bias-free: HiT's constructor default qkv_bias=False reaches these
        # convs (`HiT.py:203-214,319`)
        h = nn.Conv(c, (1, 3), padding=((0, 0), (1, 1)), use_bias=False,
                    feature_group_count=c, name="mlp_c")(x)
        w = nn.Conv(c, (3, 1), padding=((1, 1), (0, 0)), use_bias=False,
                    feature_group_count=c, name="mlp_h")(x)
        cc = nn.Conv(c, (1, 1), use_bias=False, name="mlp_w")(x)
        a = (h + w + cc).mean(axis=(1, 2))  # [B, C]
        a = Mlp(c, c // 4, c * 3, name="reweight")(a, train)
        a = jax.nn.softmax(a.reshape(b, c, 3), axis=-1)
        a = a.transpose(2, 0, 1)[:, :, None, None, :]
        z = h * a[0] + w * a[1] + cc * a[2]
        # reference quirk (`HiT.py:231-233`): the branch sum lives in
        # channel-first layout and is RESHAPED (not permuted) back to
        # [B, H, W, C] — a memory scramble that feeds proj a mix of axes.
        # Preserved for parity with the published model.
        z = z.transpose(0, 3, 1, 2).reshape(b, hh, ww, c)
        return nn.Dense(self.dim, name="proj")(z)


class WeightedPermuteMLP(nn.Module):
    """Segment-wise H/W/C linear permutes (`HiT.py:167-197`)."""

    dim: int
    segment_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, hh, ww, c = x.shape
        sd = self.segment_dim
        s = c // sd
        h = x.reshape(b, hh, ww, sd, s).transpose(0, 3, 2, 1, 4).reshape(b, sd, ww, hh * s)
        h = nn.Dense(hh * s, use_bias=False, name="mlp_h")(h)
        h = h.reshape(b, sd, ww, hh, s).transpose(0, 3, 2, 1, 4).reshape(b, hh, ww, c)
        w = x.reshape(b, hh, ww, sd, s).transpose(0, 1, 3, 2, 4).reshape(b, hh, sd, ww * s)
        w = nn.Dense(ww * s, use_bias=False, name="mlp_w")(w)
        w = w.reshape(b, hh, sd, ww, s).transpose(0, 1, 3, 2, 4).reshape(b, hh, ww, c)
        cc = nn.Dense(c, use_bias=False, name="mlp_c")(x)
        a = (h + w + cc).mean(axis=(1, 2))
        a = Mlp(c, c // 4, c * 3, name="reweight")(a, train)
        a = jax.nn.softmax(a.reshape(b, c, 3), axis=-1).transpose(2, 0, 1)[:, :, None, None, :]
        z = h * a[0] + w * a[1] + cc * a[2]
        return nn.Dense(self.dim, name="proj")(z)


class PermutatorBlock(nn.Module):
    dim: int
    segment_dim: int
    mlp_ratio: float = 3.0
    use_conv_mixer: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        if self.use_conv_mixer:
            x = x + ConvPermuteMLP(self.dim, name="attn")(y, train)
        else:
            x = x + WeightedPermuteMLP(self.dim, self.segment_dim, name="attn")(y, train)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x + Mlp(self.dim, int(self.dim * self.mlp_ratio), self.dim,
                       name="mlp")(y, train)


class HiT(nn.Module):
    bands: int
    num_classes: int
    layers: Tuple[int, ...] = (4, 3, 14, 3)
    embed_dims: Tuple[int, ...] = (480, 480, 512, 512)
    transitions: Tuple[bool, ...] = (False, True, False, False)
    segment_dim: Tuple[int, ...] = (8, 8, 4, 4)
    mlp_ratios: Tuple[float, ...] = (3.0, 3.0, 3.0, 3.0)
    use_conv_mixer: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # [B, h, w, bands] -> [B, s, h, w, 1]
        z = jnp.transpose(x, (0, 3, 1, 2))[..., None]
        z = DynamicConv3d(1, 4, (3, 3, 3), (2, 2, 2), name="proj1_1")(z, train)
        z = DynamicConv3d(4, 8, (3, 3, 3), (2, 1, 1), name="proj2_1")(z, train)
        b, s, hh, ww, c = z.shape
        # (C, D) fold into the token feature dim, c-major: the reference's
        # reshape(B, D*H, W, C) names the CHANNEL axis "D" (its conv output
        # is [B, 8, D', H', W']), so feature index = channel * D' + d
        # (`HiT.py:278-280,366-369`)
        z = jnp.transpose(z, (0, 2, 3, 4, 1)).reshape(b, hh, ww, c * s)
        if z.shape[-1] != self.embed_dims[0]:
            z = nn.Dense(self.embed_dims[0], name="embed_proj")(z)

        for i, n_blocks in enumerate(self.layers):
            for j in range(n_blocks):
                z = PermutatorBlock(self.embed_dims[i], self.segment_dim[i],
                                    self.mlp_ratios[i], self.use_conv_mixer,
                                    name=f"block_{i}_{j}")(z, train)
            if i < len(self.layers) - 1 and (
                self.transitions[i] or self.embed_dims[i] != self.embed_dims[i + 1]
            ):
                ps = 2 if self.transitions[i] else 1
                z = nn.Conv(self.embed_dims[i + 1], (ps, ps), strides=(ps, ps),
                            padding="VALID", name=f"downsample_{i}")(z)

        z = z.reshape(b, -1, z.shape[-1])
        z = nn.LayerNorm(epsilon=1e-5, name="norm")(z)
        return nn.Dense(self.num_classes, name="head")(z.mean(axis=1))
