"""FDSSC: fast dense spectral-spatial 3-D conv network (PReLU activations).

Behavioral re-implementation of
`/root/reference/Compared_Methods/FDSSC.py:11-130` (the harness actually runs
``FDSSC_f``, a Conv1d/Conv2d re-expression of the same network,
`FDSSC.py:133-251` / `Compared_Experiment.py:33` — channels-last XLA convs
give us the fast form for free):

* spectral dense block: Conv3d 24x(1,1,7)/s(1,1,2), then three (1,1,7) convs
  with dense concatenation (24->60 channels), BN+PReLU before each conv,
* transition: (1,1,k) conv to 200 features collapsing spectra
  (k = ceil((bands-6)/2)), features become the new spectral axis,
* spatial dense block: (3,3,200) conv to 24, then three (3,3,1) convs with
  dense concat to 60,
* BN+PReLU, global average pool, dropout 0.5, linear.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-3, name=name)


class FDSSC(nn.Module):
    bands: int
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = lambda i: nn.PReLU(negative_slope_init=0.25, name=f"prelu{i}")
        b = x.shape[0]
        x5 = x[..., None]  # [B, h, w, bands, 1]

        x1 = nn.Conv(24, (1, 1, 7), strides=(1, 1, 2), padding="VALID",
                     name="conv1")(x5)
        y = act(1)(_bn(train, "bn1")(x1))
        x2 = nn.Conv(12, (1, 1, 7), padding=((0, 0), (0, 0), (3, 3)), name="conv2")(y)
        y = act(2)(_bn(train, "bn2")(jnp.concatenate([x1, x2], -1)))
        x3 = nn.Conv(12, (1, 1, 7), padding=((0, 0), (0, 0), (3, 3)), name="conv3")(y)
        y = act(3)(_bn(train, "bn3")(jnp.concatenate([x1, x2, x3], -1)))
        x4 = nn.Conv(12, (1, 1, 7), padding=((0, 0), (0, 0), (3, 3)), name="conv4")(y)
        y = act(4)(_bn(train, "bn4")(jnp.concatenate([x1, x2, x3, x4], -1)))

        k3d = math.ceil((self.bands - 6) / 2)
        y = nn.Conv(200, (1, 1, k3d), padding="VALID", name="conv5")(y)
        # BN(200)+PReLU BEFORE the features fold into the spectral axis —
        # the reference normalizes the 200 conv5 channels (`FDSSC.py:168-171,
        # 227-231`), not the folded axis
        y = act(5)(_bn(train, "bn5")(y))
        bb, h, w, s, c = y.shape
        y = y.reshape(bb, h, w, s * c, 1)
        x7 = nn.Conv(24, (3, 3, s * c), padding="VALID", name="conv6")(y)
        y = act(6)(_bn(train, "bn6")(x7))
        x8 = nn.Conv(12, (3, 3, 1), padding=((1, 1), (1, 1), (0, 0)), name="conv7")(y)
        y = act(7)(_bn(train, "bn7")(jnp.concatenate([x7, x8], -1)))
        x9 = nn.Conv(12, (3, 3, 1), padding=((1, 1), (1, 1), (0, 0)), name="conv8")(y)
        y = act(8)(_bn(train, "bn8")(jnp.concatenate([x7, x8, x9], -1)))
        x10 = nn.Conv(12, (3, 3, 1), padding=((1, 1), (1, 1), (0, 0)), name="conv9")(y)
        y = act(9)(_bn(train, "bn9")(jnp.concatenate([x7, x8, x9, x10], -1)))

        y = y.mean(axis=(1, 2, 3))  # global average pool -> [B, 60]
        y = nn.Dropout(0.5, deterministic=not train)(y)
        return nn.Dense(self.num_classes, name="fc")(y)
