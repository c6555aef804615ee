"""SSRN: spectral-then-spatial 3-D residual network.

Behavioral re-implementation of `/root/reference/Compared_Methods/SSRN.py:35-90`
(original: lironui/Double-Branch-Dual-Attention-Mechanism-Network), channels-last:

stage 1 (spectral): Conv3d 24x(1,1,7)/s(1,1,2) -> BN/ReLU -> 2 residual blocks
  with (1,1,7) kernels -> Conv3d 128x(1,1,k) collapsing the spectral axis
  (k = ceil((bands-6)/2)) -> BN/ReLU;
stage 2 (spatial): the 128 channels become the "spectral" axis of a second
  3-D conv 24x(3,3,128) -> BN/ReLU -> 2 residual blocks with (3,3,1) kernels;
head: 5x5 average pool -> dropout(0.5) -> linear.

The residual block is conv-ReLU-BN / conv-BN with post-add ReLU
(`SSRN.py:10-33` — note the quirky double activation conv1->ReLU->BN->ReLU).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


class Residual3D(nn.Module):
    features: int
    kernel: tuple
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.features, self.kernel, padding="SAME", name="conv1")(x)
        y = nn.relu(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=self.eps, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, self.kernel, padding="SAME", name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=self.eps, name="bn2")(y)
        return nn.relu(y + x)


class SSRN(nn.Module):
    bands: int
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        # [B, h, w, bands] -> [B, h, w, bands, 1]: spatial dims (h, w, spectral)
        x = x[..., None]
        x = nn.Conv(24, (1, 1, 7), strides=(1, 1, 2), padding="VALID", name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-3, name="bn1")(x))
        x = Residual3D(24, (1, 1, 7), name="res1")(x, train)
        x = Residual3D(24, (1, 1, 7), name="res2")(x, train)

        k3d = math.ceil((self.bands - 6) / 2)
        x = nn.Conv(128, (1, 1, k3d), padding="VALID", name="conv2")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-3, name="bn2")(x))
        # collapse spectral axis (now size 1); the 128 channels become the new
        # spectral axis for the spatial stage (`SSRN.py:85-87` permute)
        b, h, w, s, c = x.shape
        x = x.reshape(b, h, w, s * c, 1)
        x = nn.Conv(24, (3, 3, s * c), padding="VALID", name="conv3")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-3, name="bn3")(x))
        x = Residual3D(24, (3, 3, 1), name="res3")(x, train)
        x = Residual3D(24, (3, 3, 1), name="res4")(x, train)

        # AvgPool3d((5, 5, 1)), stride = kernel, then flatten (`SSRN.py:66,89`)
        x = nn.avg_pool(x, (5, 5, 1), strides=(5, 5, 1))
        x = x.reshape(b, -1)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="fc")(x)
