"""DBDA: double-branch dense 3-D conv network with position (PAM) and
channel (CAM) attention, Mish activations.

Behavioral re-implementation of
`/root/reference/Compared_Methods/DBDA.py:100-217` (original
lironui/Double-Branch-Dual-Attention-Mechanism-Network), channels-last:

* spectral branch: Conv3d 24x(1,1,7)/s(1,1,2), then a 3-step dense block of
  (1,1,7) convs (24 -> +12 -> +12 -> +12 = 60 channels), then a (1,1,k)
  conv collapsing the spectral axis (k = floor((bands-6)/2)); channel
  attention (CAM) gates the result,
* spatial branch: Conv3d 24x(1,1,bands) collapsing spectra immediately, then
  a dense block of (3,3,1) convs to 60 channels; position attention (PAM)
  gates the result,
* both attentions are residual (gamma init 0: ``out = gamma*attn + x``) and
  are multiplied elementwise with their input feature maps,
* global average pool each branch -> concat 120 -> dropout 0.5 -> linear.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _bn(train, name, eps=1e-3):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=eps, name=name)


class CAM(nn.Module):
    """Channel attention (`DBDA.py:66-98`): attention over channels from the
    gram matrix of flattened maps, with the max-minus-energy trick."""

    @nn.compact
    def __call__(self, x):  # x: [B, h, w, s, C]
        b = x.shape[0]
        c = x.shape[-1]
        flat = x.reshape(b, -1, c)  # [B, hw*s, C]
        energy = jnp.einsum("bpc,bpd->bcd", flat, flat)  # [B, C, C]
        energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = jax.nn.softmax(energy_new, axis=-1)
        out = jnp.einsum("bcd,bpd->bpc", attn, flat).reshape(x.shape)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out + x


class PAM(nn.Module):
    """Position attention (`DBDA.py:10-63`): query/key at C//8, softmax over
    positions."""

    @nn.compact
    def __call__(self, x):  # x: [B, h, w, C] (spectral axis already collapsed)
        b, h, w, c = x.shape
        q = nn.Conv(c // 8, (1, 1), name="query")(x).reshape(b, h * w, -1)
        k = nn.Conv(c // 8, (1, 1), name="key")(x).reshape(b, h * w, -1)
        v = nn.Conv(c, (1, 1), name="value")(x).reshape(b, h * w, c)
        energy = jnp.einsum("bqd,bkd->bqk", q, k)
        attn = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out + x


class DBDA(nn.Module):
    bands: int
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x5 = x[..., None]  # [B, h, w, bands, 1]

        # ---- spectral branch (dense (1,1,7) stack) ------------------------
        x11 = nn.Conv(24, (1, 1, 7), strides=(1, 1, 2), padding="VALID",
                      name="conv11")(x5)
        y = mish(_bn(train, "bn11")(x11))
        x12 = nn.Conv(12, (1, 1, 7), padding=((0, 0), (0, 0), (3, 3)),
                      name="conv12")(y)
        y = mish(_bn(train, "bn12")(jnp.concatenate([x11, x12], -1)))
        x13 = nn.Conv(12, (1, 1, 7), padding=((0, 0), (0, 0), (3, 3)),
                      name="conv13")(y)
        y = mish(_bn(train, "bn13")(jnp.concatenate([x11, x12, x13], -1)))
        x14 = nn.Conv(12, (1, 1, 7), padding=((0, 0), (0, 0), (3, 3)),
                      name="conv14")(y)
        x15 = jnp.concatenate([x11, x12, x13, x14], -1)  # 60 ch
        y = mish(_bn(train, "bn14")(x15))
        k3d = math.floor((self.bands - 6) / 2)
        x16 = nn.Conv(60, (1, 1, k3d), padding="VALID", name="conv15")(y)
        x1 = CAM(name="cam")(x16) * x16
        x1 = x1.mean(axis=(1, 2, 3))  # AdaptiveAvgPool3d(1) -> [B, 60]

        # ---- spatial branch (dense (3,3,1) stack) -------------------------
        x21 = nn.Conv(24, (1, 1, self.bands), padding="VALID", name="conv21")(x5)
        y = mish(_bn(train, "bn21")(x21))
        x22 = nn.Conv(12, (3, 3, 1), padding=((1, 1), (1, 1), (0, 0)),
                      name="conv22")(y)
        y = mish(_bn(train, "bn22")(jnp.concatenate([x21, x22], -1)))
        x23 = nn.Conv(12, (3, 3, 1), padding=((1, 1), (1, 1), (0, 0)),
                      name="conv23")(y)
        y = mish(_bn(train, "bn23")(jnp.concatenate([x21, x22, x23], -1)))
        x24 = nn.Conv(12, (3, 3, 1), padding=((1, 1), (1, 1), (0, 0)),
                      name="conv24")(y)
        x25 = jnp.concatenate([x21, x22, x23, x24], -1)  # [B, h, w, 1, 60]
        x2_in = x25.squeeze(3)
        x2 = PAM(name="pam")(x2_in)[..., None, :].squeeze(3) * x2_in
        x2 = x2.mean(axis=(1, 2))  # [B, 60]

        z = jnp.concatenate([x1, x2], axis=-1)
        z = nn.Dropout(0.5, deterministic=not train)(z)
        return nn.Dense(self.num_classes, name="fc")(z)
