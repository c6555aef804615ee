"""SSFTT: 3-D + 2-D conv stem, learned tokenizer, 1-layer transformer.

Behavioral re-implementation of
`/root/reference/Compared_Methods/SSFTT.py:112-176` (original zgr6010/HSI_SSFTT):

* Conv3d k3D x (3,3,3) over (spectral, h, w) -> BN/ReLU,
* merge (k3D, spectral-2) into channels, Conv2d k2D x (3,3) -> BN/ReLU,
* learned tokenization: A = softmax((X wA)^T) over pixels; T = A (X wV)
  giving ``num_tokens`` tokens (`SSFTT.py:150-158`),
* prepend cls token + learned pos embedding, 1 transformer block
  (attention scale = dim**-0.5, a quirk: scales by full dim, not head dim),
* cls-token linear head.

Expects PCA-reduced input (harness uses 30 bands, `Compared_Experiment.py:488`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from hsimae_tpu.models.baselines.common import TransformerEncoder


class SSFTT(nn.Module):
    num_classes: int
    kernel_3d: int = 8
    kernel_2d: int = 64
    num_tokens: int = 4
    dim: int = 64
    depth: int = 1
    heads: int = 8
    mlp_dim: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        # [B, h, w, bands] -> 3-D conv over (bands, h, w) with feature dim 1
        x = jnp.transpose(x, (0, 3, 1, 2))[..., None]  # [B, s, h, w, 1]
        x = nn.Conv(self.kernel_3d, (3, 3, 3), padding="VALID", name="conv3d")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name="bn3d")(x))
        # merge (channels, spectral) -> channels (`SSFTT.py:160`)
        b_, s, h, w, c = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b_, h, w, s * c)
        x = nn.Conv(self.kernel_2d, (3, 3), padding="VALID", name="conv2d")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name="bn2d")(x))
        x = x.reshape(b, -1, self.kernel_2d)  # [B, hw, k2D]

        # learned tokenizer (`SSFTT.py:150-158`)
        wa = self.param("token_wA", nn.initializers.xavier_normal(),
                        (self.num_tokens, self.kernel_2d))
        wv = self.param("token_wV", nn.initializers.xavier_normal(),
                        (self.kernel_2d, self.dim))
        a = jnp.einsum("bpc,tc->btp", x, wa)
        a = jax.nn.softmax(a, axis=-1)
        t = jnp.einsum("btp,bpd->btd", a, x @ wv)  # [B, L, dim]

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        pos = self.param("pos_embedding",
                         nn.initializers.normal(0.02),
                         (1, self.num_tokens + 1, self.dim))
        z = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), t], axis=1) + pos
        z = nn.Dropout(self.dropout, deterministic=not train)(z)
        z = TransformerEncoder(
            self.dim, self.depth, self.heads, self.mlp_dim,
            dim_head=self.dim // self.heads, dropout=self.dropout,
            attn_scale=self.dim**-0.5,  # SSFTT scales by full dim (`SSFTT.py:57`)
            name="transformer",
        )(z, train)
        return nn.Dense(self.num_classes, name="head")(z[:, 0])
