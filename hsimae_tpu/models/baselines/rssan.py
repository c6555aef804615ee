"""RSSAN: 2-D conv residual network with spectral + spatial attention.

Behavioral re-implementation of
`/root/reference/Compared_Methods/RSSAN.py:75-114`. Two reference quirks are
preserved deliberately (they define the published behavior):

* ``SSA_Module`` applies ``conv1`` TWICE — ``conv2`` exists but is never
  called (`RSSAN.py:62-66`),
* the top-level forward runs ``ssa1, ssa2, ssa1`` — ``ssa3`` exists but is
  never called (`RSSAN.py:108-110`).

Spectral attention = CBAM-style shared-MLP over avg+max pooled channel
vectors; spatial attention = sigmoid conv over [mean, max] channel maps.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SpectralAttention(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):  # [B, h, w, C]
        y1 = x.mean(axis=(1, 2))
        y2 = x.max(axis=(1, 2))
        fc1 = nn.Dense(self.hidden, name="fc1")
        fc2 = nn.Dense(self.out, name="fc2")

        def mlp(v):  # shared MLP (`RSSAN.py:10-15`), applied to avg and max
            return nn.sigmoid(fc2(nn.relu(fc1(v))))

        y = mlp(y1) + mlp(y2)
        return nn.sigmoid(y)[:, None, None, :]


class SpatialAttention(nn.Module):
    @nn.compact
    def __call__(self, x):  # [B, h, w, C]
        avg = x.mean(axis=-1, keepdims=True)
        mx = x.max(axis=-1, keepdims=True)
        y = jnp.concatenate([avg, mx], axis=-1)
        y = nn.Conv(1, (3, 3), padding=1, name="conv")(y)
        return nn.sigmoid(y)


class SSAModule(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv1 = nn.Conv(self.features, (3, 3), padding=1, name="conv1")
        x1 = conv1(x)
        x1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-3, name="bn1")(x1)
        x1 = nn.relu(x1)
        x1 = conv1(x1)  # reference quirk: conv1 applied twice
        x1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-3, name="bn2")(x1)
        x2 = SpectralAttention(self.features // 8, self.features, name="spe")(x1) * x1
        x3 = SpatialAttention(name="spa")(x2) * x2
        return nn.relu(x3 * x1 + x)


class RSSAN(nn.Module):
    bands: int
    num_classes: int
    features: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SpectralAttention(self.bands // 8, self.bands, name="attn1")(x) * x
        x = SpatialAttention(name="attn2")(x) * x
        x = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, name="bn1")(x)
        x = nn.relu(x)
        ssa1 = SSAModule(self.features, name="ssa1")
        ssa2 = SSAModule(self.features, name="ssa2")
        x = ssa1(x, train)
        x = ssa2(x, train)
        x = ssa1(x, train)  # reference quirk: ssa1 again, ssa3 unused
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(x)
