"""SpectralFormer: band-wise ViT with group-wise spectral embedding (GSE) and
cross-layer adaptive fusion (CAF) skips.

Behavioral re-implementation of
`/root/reference/Compared_Methods/SpectralFormer.py:139-179`
(original danfenghong/IEEE_TGRS_SpectralFormer):

* tokens = spectral BANDS (one token per band), token features = the patch's
  pixels (image_size^2),
* GSE embedding: a 1-D conv across the band axis with kernel ``near_band``
  mixes each band with its neighbors while projecting pixels -> dim
  (`SpectralFormer.py:14-22`),
* cls token + learned pos embedding, depth-5 transformer,
* CAF mode: from layer 2 on, the input is a learned 2->1 fusion (a (1,2)
  conv over tokens) of the current features and the features from two layers
  back (`SpectralFormer.py:117,124-134`),
* cls-token LayerNorm + linear head.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from hsimae_tpu.models.baselines.common import FusedAttention, MlpBlock


class SpectralFormer(nn.Module):
    image_size: int
    near_band: int
    num_bands: int  # = num tokens
    num_classes: int
    dim: int = 64
    depth: int = 5
    heads: int = 4
    mlp_dim: int = 8
    dim_head: int = 16
    dropout: float = 0.1
    mode: str = "CAF"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, bands = x.shape
        assert bands == self.num_bands
        # tokens = bands, features = pixels (`SpectralFormer.py:169`)
        x = x.reshape(b, h * w, bands)
        # GSE: Conv1d over the band axis, in=pixels out=dim, kernel=near_band,
        # padding near_band//2 (`SpectralFormer.py:17`)
        x = jnp.swapaxes(x, 1, 2)  # [B, bands, pixels]
        x = nn.Conv(self.dim, (self.near_band,),
                    padding=self.near_band // 2, name="gse")(x)  # [B, bands, dim]

        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, self.num_bands + 1, self.dim))
        z = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1) + pos
        z = nn.Dropout(self.dropout, deterministic=not train)(z)

        outputs = []
        for i in range(self.depth):
            outputs.append(z)
            if self.mode == "CAF" and i > 1:
                # fuse current z with output of layer i-2 by a (1,2) conv over
                # the stacked pair, per token (`SpectralFormer.py:130-133`)
                pair = jnp.stack([z, outputs[i - 2]], axis=-1)  # [B, n, d, 2]
                n_tok = pair.shape[1]
                pair = pair.transpose(0, 2, 3, 1)  # [B, d, 2, n] tokens=channels
                z = nn.Conv(n_tok, (1, 2), padding="VALID",
                            name=f"skipcat_{i - 2}")(pair)  # [B, d, 1, n]
                z = z.squeeze(2).transpose(0, 2, 1)  # [B, n, d]
            y = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(z)
            z = z + FusedAttention(self.dim, self.heads, self.dim_head,
                                   self.dropout, qkv_bias=False,
                                   name=f"attn_{i}")(y, train)
            y = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(z)
            z = z + MlpBlock(self.dim, self.mlp_dim, self.dropout,
                             name=f"mlp_{i}")(y, train)

        z = nn.LayerNorm(epsilon=1e-5, name="head_norm")(z[:, 0])
        return nn.Dense(self.num_classes, name="head")(z)
