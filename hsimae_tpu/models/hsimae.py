"""The HSIMAE model family: separable spatial/spectral MAE encoder, MAE
decoder, and classification head — one flax module covering the reference's
three classes:

* ``HSIMAE``  (pretraining: encoder + decoder + pixel loss)   `Models.py:309-634`
* ``DualViT`` (fine-tuning: + cls head, dual fwd)             `Models.py:637-993`
* ``HSIViT``  (inference: encoder + cls head only)            `Models.py:996-1161`

They share every encoder parameter (checkpoints restore between them by key
intersection), so here they are a single module with construction flags; the
factory helpers at the bottom mirror the reference constructors.

TPU-first notes
---------------
* Kept-grid masking means the (b t) l / (b l) t separable rearranges are
  reshapes/transposes of a dense [N, t, l, C] array — token gathers happen
  once, at mask time.
* The decoder "unshuffle" is a one-hot scatter (all mask tokens are the mean
  of the encoded tokens, preserving the reference's quirk at
  `Models.py:583-584` where the learned mask_token parameter is unused — we
  simply don't create that dead parameter).
* Position tables are closed-form constants, not parameters (the reference
  stores them as frozen Parameters; the converter verifies instead of loads).
* ``len_t``/``len_l`` are static python ints -> a handful of jit
  specializations instead of dynamic shapes (see masking.grid_shape_candidates).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hsimae_tpu.config import ModelConfig
from hsimae_tpu.models.layers import Attention, Block, PatchEmbed, trunc_normal_init
from hsimae_tpu.models.masking import (
    GridMask,
    gather_tokens,
    scatter_tokens,
    spatial_spectral_mask,
)
from hsimae_tpu.models.pos_embed import sincos_3d

# Param-tree name of the classification-head submodule (the flax attribute
# set in HSIMAE.setup). Coverage checks (train/evaluate.classify_scene) key
# on this prefix, so a rename must update exactly this constant.
CLS_HEAD_NAME = "cls_head"


def patchify(imgs: jax.Array, p: int, u: int) -> jax.Array:
    """[N, H, W, bands] -> [N, t*h*w, u*p*p] pixel targets.

    Token order (t, h, w) and feature order (u, p_row, p_col) match both
    PatchEmbed and the reference's ``patchify`` einsum (`Models.py:461-473`).
    """
    n, hh, ww, bands = imgs.shape
    h, w, t = hh // p, ww // p, bands // u
    x = imgs.reshape(n, h, p, w, p, t, u)
    x = x.transpose(0, 5, 1, 3, 6, 2, 4)  # [N, t, h, w, u, p, q]
    return x.reshape(n, t * h * w, u * p * p)


def unpatchify(x: jax.Array, p: int, u: int, grid: int, t: int) -> jax.Array:
    """Inverse of :func:`patchify` -> [N, H, W, bands]."""
    n = x.shape[0]
    x = x.reshape(n, t, grid, grid, u, p, p)
    x = x.transpose(0, 2, 5, 3, 6, 1, 4)  # [N, h, p, w, q, t, u]
    return x.reshape(n, grid * p, grid * p, t * u)


def mae_loss(
    pred: jax.Array,
    target: jax.Array,
    mask: jax.Array,
    norm_pix: bool = True,
    sample_weight: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Masked-token MSE (`Models.py:603-616`). Returns (loss, mean, std) so
    reconstructions can be un-normalized for visualization.

    ``norm_pix`` standardizes each target token with its own mean/var (var is
    unbiased, torch's default); eps is added to var before the sqrt.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if norm_pix:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True, ddof=1)
        std = jnp.sqrt(var + 1.0e-6)
        target = (target - mean) / std
    else:
        mean = jnp.zeros_like(target[..., :1])
        std = jnp.ones_like(target[..., :1])
    tok = ((pred - target) ** 2).mean(axis=-1)  # [N, S]
    w = mask
    if sample_weight is not None:
        w = w * sample_weight[:, None]
    return (tok * w).sum() / jnp.maximum(w.sum(), 1.0), mean, std


class HSIMAE(nn.Module):
    """Separable spatial/spectral masked autoencoder for HSI patches.

    Input layout: ``[N, img, img, bands]`` channels-last.

    rng streams: ``'mask'`` (grid masking), ``'droppath'`` (stochastic depth).
    """

    cfg: ModelConfig
    with_decoder: bool = True

    def setup(self):
        c = self.cfg
        ki = trunc_normal_init(0.02) if c.trunc_init else nn.initializers.xavier_uniform()
        self._kernel_init = ki
        self.patch_embed = PatchEmbed(
            embed_dim=c.embed_dim,
            patch_size=c.patch_size,
            b_patch_size=c.b_patch_size,
            dtype=c.compute_dtype,
            trunc_init=c.trunc_init,
        )
        dpr = np.linspace(0.0, c.drop_path, c.depth)

        # remat: same params, same outputs — only the autodiff schedule
        # changes (block activations recomputed in backward instead of saved)
        block_cls = nn.remat(Block, static_argnums=(2,)) if c.remat else Block

        def block(dim, heads, rate, **kw):
            return block_cls(
                dim,
                heads,
                mlp_ratio=c.mlp_ratio,
                qkv_bias=c.qkv_bias,
                drop_path_rate=float(rate),
                dtype=c.compute_dtype,
                kernel_init=ki,
                **kw,
            )

        if c.s_depth > 0:
            self.blocks_1 = [block(c.embed_dim, c.num_heads, dpr[i]) for i in range(c.s_depth)]
            self.blocks_2 = [block(c.embed_dim, c.num_heads, dpr[i]) for i in range(c.s_depth)]
        # fusion blocks exist only for s_depth < 12 (reference quirk,
        # `Models.py:385,566`) — otherwise indices [s_depth, depth) are empty
        self.blocks = [
            block(c.embed_dim, c.num_heads, dpr[i]) for i in range(c.s_depth, c.depth)
        ] if c.s_depth < 12 else []
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)

        self.pos_embed = jnp.asarray(sincos_3d(c.embed_dim, c.t_size, c.grid_size))

        if self.with_decoder:
            self.decoder_embed = nn.Dense(
                c.decoder_dim, kernel_init=ki, bias_init=nn.initializers.zeros,
                dtype=c.compute_dtype,
            )
            self.decoder_blocks = [
                block(c.decoder_dim, c.decoder_num_heads, 0.0) for _ in range(c.decoder_depth)
            ]
            self.decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
            self.decoder_pred = nn.Dense(
                c.pixels_per_patch, kernel_init=ki, bias_init=nn.initializers.zeros,
                dtype=c.compute_dtype,
            )
            self.decoder_pos_embed = jnp.asarray(
                sincos_3d(c.decoder_dim, c.t_size, c.grid_size)
            )

        if c.num_classes > 0:
            # attribute name == CLS_HEAD_NAME (the param-tree prefix callers
            # key coverage checks on — keep the two in sync)
            self.cls_head = nn.Dense(
                c.num_classes, kernel_init=ki, bias_init=nn.initializers.zeros,
                dtype=jnp.float32,
            )

    # ----------------------------- encoder --------------------------------

    def _use_pallas(self, train: bool) -> bool:
        """Pallas engages on the inference path only: the kernel defines no
        VJP (training keeps XLA's fused backward) and param creation must go
        through the flax modules at init. Off-TPU the fused path still runs
        (through the kernel's XLA fallback) so CI exercises the wiring."""
        if not self.cfg.use_pallas or train or self.is_initializing():
            return False
        from hsimae_tpu.ops.fused_block import FUSED_BLOCK_AVAILABLE

        return FUSED_BLOCK_AVAILABLE

    def _run_blocks(self, blocks, x: jax.Array, train: bool) -> jax.Array:
        """Apply a list of Blocks; on the inference path with
        ``cfg.use_pallas`` each block runs as the fused Pallas kernel
        (<=256-row single-program calls, `ops/fused_block.py`)."""
        if self._use_pallas(train):
            from hsimae_tpu.ops.fused_block import (
                fused_block_sliced,
                params_from_flax,
            )

            # cast ONCE on entry (not per block): the kernel computes in the
            # stream dtype, so with an f32 stream and compute_dtype=bf16 the
            # fused path rounds the residual stream where the flax path would
            # keep it f32 — a documented divergence bounded by the bf16 case
            # of test_model_use_pallas_inference_path_matches_default.
            if x.dtype != self.cfg.compute_dtype:
                x = x.astype(self.cfg.compute_dtype)
            for blk in blocks:
                x = fused_block_sliced(
                    x,
                    params_from_flax(blk.variables["params"]),
                    self.cfg.num_heads,
                )
            return x
        for blk in blocks:
            x = blk(x, train)
        return x

    def _encode_grid(self, x: jax.Array, t: int, l: int, train: bool) -> jax.Array:
        """Run separable + fusion blocks over a dense [N, t, l, C] token grid."""
        c = self.cfg
        n = x.shape[0]
        dim = x.shape[-1]
        if c.s_depth > 0:
            x1 = self._run_blocks(self.blocks_1, x.reshape(n * t, l, dim), train)
            x2 = self._run_blocks(
                self.blocks_2, x.transpose(0, 2, 1, 3).reshape(n * l, t, dim), train
            )
            x = x1.reshape(n, t, l, dim) + x2.reshape(n, l, t, dim).transpose(0, 2, 1, 3)
        x = self._run_blocks(self.blocks, x.reshape(n, t * l, dim), train)
        return self.norm(x)

    def encode(self, imgs: jax.Array, train: bool = False) -> jax.Array:
        """Unmasked encoding -> [N, T*L, C] (`DualViT.forward_encoder`)."""
        c = self.cfg
        tokens = self.patch_embed(imgs)  # [N, T, L, C]
        x = tokens + self.pos_embed.reshape(1, c.t_size, c.l_size, c.embed_dim).astype(
            tokens.dtype
        )
        return self._encode_grid(x, c.t_size, c.l_size, train)

    def encode_masked(
        self, imgs: jax.Array, len_t: int, len_l: int, train: bool = True
    ) -> Tuple[jax.Array, GridMask]:
        """Masked encoding of the kept grid (`HSIMAE.forward_encoder`).

        The kept set is a cross-product grid, so the token gather factors
        into two tiny axis gathers (rows then columns of the [T, L] grid)
        instead of one [N, K] token gather — cheaper, and the pos table
        gather rides along by adding pos BEFORE the row/col selection.
        """
        c = self.cfg
        n = imgs.shape[0]
        tokens = self.patch_embed(imgs)  # [N, T, L, C]
        gm = spatial_spectral_mask(
            self.make_rng("mask"), n, c.t_size, c.l_size, len_t, len_l
        )
        x = tokens + self.pos_embed.reshape(
            1, c.t_size, c.l_size, c.embed_dim
        ).astype(tokens.dtype)
        x = jnp.take_along_axis(x, gm.ids_t[:, :, None, None], axis=1)
        x = jnp.take_along_axis(x, gm.ids_l[:, None, :, None], axis=2)
        return self._encode_grid(x, len_t, len_l, train), gm

    # ----------------------------- decoder --------------------------------

    def decode(self, latent: jax.Array, ids_keep: jax.Array, train: bool = True) -> jax.Array:
        """MAE decoder (`forward_decoder`, `Models.py:573-601`): project,
        scatter kept tokens among mean-tokens, add pos, run blocks, predict
        pixels -> [N, T*L, u*p*p]."""
        c = self.cfg
        x = self.decoder_embed(latent)
        mask_token = x.mean(axis=1, keepdims=True)
        full = scatter_tokens(x, ids_keep, c.num_patches, mask_token)
        full = full + self.decoder_pos_embed[None].astype(full.dtype)
        for blk in self.decoder_blocks:
            full = blk(full, train)
        return self.decoder_pred(self.decoder_norm(full).astype(x.dtype))

    # ------------------------------- heads --------------------------------

    def classify(self, imgs: jax.Array, train: bool = False) -> jax.Array:
        """Classification head (`DualViT.head`, `Models.py:964-973`).
        'agg': group latent by spatial position, concat spectral groups, mean
        over positions; 'gap': plain mean over all tokens."""
        c = self.cfg
        latent = self.encode(imgs, train)
        n = latent.shape[0]
        if c.head_mode == "gap":
            x = latent.reshape(n, c.num_patches, c.embed_dim).mean(axis=1)
        else:
            x = latent.reshape(n, c.t_size, c.l_size, c.embed_dim)
            x = x.transpose(0, 2, 1, 3).reshape(n, c.l_size, c.t_size * c.embed_dim)
            x = x.mean(axis=1)
        return self.cls_head(x.astype(jnp.float32))

    # ----------------------------- forwards -------------------------------

    def forward_pretrain(
        self,
        imgs: jax.Array,
        len_t: int,
        len_l: int,
        train: bool = True,
        sample_weight: Optional[jax.Array] = None,
    ):
        """(loss, pred, mask, (mean, std)) — `HSIMAE.forward` minus the
        visualization unpatchify, which lives in :func:`reconstruct`."""
        c = self.cfg
        latent, gm = self.encode_masked(imgs, len_t, len_l, train)
        pred = self.decode(latent, gm.ids_keep, train)
        target = patchify(imgs, c.patch_size, c.b_patch_size)
        loss, mean, std = mae_loss(pred, target, gm.mask, c.norm_pix_loss, sample_weight)
        return loss, pred, gm.mask, (mean, std)

    def forward_dual(
        self,
        imgs: jax.Array,
        imgs_u: jax.Array,
        len_t: int,
        len_l: int,
        train: bool = True,
        sample_weight: Optional[jax.Array] = None,
    ):
        """(loss_rec, logits) — `DualViT.forward` (`Models.py:975-991`):
        classification on the labeled batch + MAE on labeled ∪ unlabeled."""
        c = self.cfg
        logits = self.classify(imgs, train)
        imgs_all = jnp.concatenate([imgs, imgs_u], axis=0)
        latent, gm = self.encode_masked(imgs_all, len_t, len_l, train)
        pred = self.decode(latent, gm.ids_keep, train)
        target = patchify(imgs_all, c.patch_size, c.b_patch_size)
        w = None
        if sample_weight is not None:
            w = jnp.concatenate(
                [sample_weight, jnp.ones(imgs_u.shape[0], sample_weight.dtype)], axis=0
            )
        loss_rec, _, _ = mae_loss(pred, target, gm.mask, c.norm_pix_loss, w)
        return loss_rec, logits

    def __call__(self, imgs: jax.Array, train: bool = False):
        """Default = classification when a head exists, else pretrain fwd with
        a maximal kept grid (used mostly for init/compile checks)."""
        if self.cfg.num_classes > 0:
            return self.classify(imgs, train)
        c = self.cfg
        return self.forward_pretrain(imgs, max(2, c.t_size // 2), c.l_size, train)


def reconstruct(pred: jax.Array, mask: jax.Array, mean, std, cfg: ModelConfig):
    """Un-normalize predictions and unpatchify both pred and mask to image
    space — the reference's ``recons`` (`Models.py:618-625`)."""
    pred = pred * std + mean
    imgs = unpatchify(pred, cfg.patch_size, cfg.b_patch_size, cfg.grid_size, cfg.t_size)
    m = jnp.repeat(mask[..., None], cfg.pixels_per_patch, axis=-1)
    m = unpatchify(m, cfg.patch_size, cfg.b_patch_size, cfg.grid_size, cfg.t_size)
    return imgs, m


# ----------------------------- factories ----------------------------------


def build_hsimae(cfg: ModelConfig) -> HSIMAE:
    """Pretraining model (`HSIMAE`, `Models.py:309`)."""
    return HSIMAE(cfg.replace(num_classes=0), with_decoder=True)


def build_dual_vit(cfg: ModelConfig, num_classes: int, drop_path: float = 0.2) -> HSIMAE:
    """Fine-tuning model (`DualViT`, `Models.py:637`)."""
    return HSIMAE(cfg.replace(num_classes=num_classes, drop_path=drop_path), with_decoder=True)


def build_hsi_vit(cfg: ModelConfig, num_classes: int) -> HSIMAE:
    """Inference model (`HSIViT`, `Models.py:996`)."""
    return HSIMAE(cfg.replace(num_classes=num_classes, drop_path=0.0), with_decoder=False)


import functools


@functools.lru_cache(maxsize=32)
def _cached_init_fn(model: HSIMAE, batch: int):
    """One JITTED init per model config: multi-seed protocol loops re-init
    dozens of times, and eager init dispatches hundreds of tiny ops (slow on
    remote backends). Seeds are runtime args, so one compile serves all."""
    c = model.cfg

    def init(k0, k1, k2):
        rngs = {"params": k0, "mask": k1, "droppath": k2}
        imgs = jnp.zeros((batch, c.img_size, c.img_size, c.bands), jnp.float32)
        if c.num_classes > 0 and model.with_decoder:
            return model.init(rngs, imgs, imgs, 2, max(2, c.l_size // 2), False,
                              method=HSIMAE.forward_dual)
        if c.num_classes > 0:
            return model.init(rngs, imgs, False, method=HSIMAE.classify)
        return model.init(rngs, imgs, 2, max(2, c.l_size // 2), False,
                          method=HSIMAE.forward_pretrain)

    return jax.jit(init)


def init_model(model: HSIMAE, seed: int = 0, batch: int = 2):
    """Initialize parameters, touching every submodule."""
    return _cached_init_fn(model, batch)(
        jax.random.key(seed), jax.random.key(seed + 1), jax.random.key(seed + 2)
    )
