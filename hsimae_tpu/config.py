"""Configuration dataclasses and named presets.

The reference hard-codes every hyperparameter inside ``__main__`` blocks
(`/root/reference/Model_Pretraining.py:116-152`,
`/root/reference/Model_Finetuning.py:304-329`); here they become typed,
immutable dataclasses with the reference defaults preserved, plus the
published size presets (``[depth, dim, s_depth]`` tuples from
`/root/reference/Model_Pretraining.py:130`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of the HSIMAE family (encoder + MAE decoder + cls head).

    Mirrors the constructor surface of ``HSIMAE`` / ``DualViT`` / ``HSIViT``
    (`/root/reference/Models.py:309,637,996`), with the reference quirks kept:

    * ``num_heads = embed_dim // 16``, ``decoder_num_heads = decoder_dim // 8``
      (`/root/reference/Model_Pretraining.py:69-71`).
    * SwiGLU hidden dim is rounded with ``multiple_of == int(mlp_ratio)``
      (`/root/reference/Models.py:301,225`).
    * fusion ("joint") blocks exist only when ``s_depth < 12``
      (`/root/reference/Models.py:385,566`).
    """

    img_size: int = 9
    patch_size: int = 3
    in_chans: int = 1
    bands: int = 32
    b_patch_size: int = 8

    embed_dim: int = 128
    depth: int = 12
    s_depth: int = 9
    num_heads: Optional[int] = None  # default: embed_dim // 16

    decoder_dim: int = 64
    decoder_depth: int = 8
    decoder_num_heads: Optional[int] = None  # default: decoder_dim // 8

    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    norm_pix_loss: bool = True
    trunc_init: bool = True
    drop_path: float = 0.0
    num_classes: int = 0  # 0: pretraining model (no cls head)
    # classification head pooling (`Models.py:964-973`): 'agg' groups the
    # latent by spatial position and concats spectral groups before the mean
    # (cls_head in = embed_dim * T); 'gap' is a plain mean over all tokens
    # (cls_head in = embed_dim)
    head_mode: str = "agg"

    # numerics policy: params/optimizer in f32, activations in `compute_dtype`
    compute_dtype: jnp.dtype = jnp.float32

    # run encoder blocks through the Pallas fused-block kernel on the
    # inference path (train=False; the training path needs autodiff, which
    # the kernel does not define — XLA's fused backward is used there).
    # Batches are sliced into <=256-row single-program pallas_calls
    # (`ops/fused_block.py` documents the gridded-compile workaround).
    use_pallas: bool = False

    # rematerialize every transformer Block in the backward pass
    # (flax.linen.remat -> jax.checkpoint): only block INPUTS are saved for
    # the backward, trading recompute FLOPs for saved-activation HBM traffic.
    # Numerics and the param tree are unchanged (test_models pins both).
    # On this runtime's bandwidth-capped sessions bytes are the binding
    # constraint, so the trade is favorable (RESULTS.md round-4 A/B).
    remat: bool = False

    def __post_init__(self):
        if self.num_heads is None:
            object.__setattr__(self, "num_heads", self.embed_dim // 16)
        if self.decoder_num_heads is None:
            object.__setattr__(self, "decoder_num_heads", self.decoder_dim // 8)
        assert self.img_size % self.patch_size == 0
        assert self.bands % self.b_patch_size == 0
        assert self.embed_dim % self.num_heads == 0
        assert self.decoder_dim % self.decoder_num_heads == 0

    # ---- derived token-grid geometry (PatchEmbed.input_size, Models.py:127) --
    @property
    def t_size(self) -> int:
        """Number of spectral groups T = bands / b_patch_size."""
        return self.bands // self.b_patch_size

    @property
    def grid_size(self) -> int:
        """Spatial grid side H' = W' = img_size / patch_size."""
        return self.img_size // self.patch_size

    @property
    def l_size(self) -> int:
        """Number of spatial positions L = H' * W'."""
        return self.grid_size * self.grid_size

    @property
    def num_patches(self) -> int:
        return self.t_size * self.l_size

    @property
    def pixels_per_patch(self) -> int:
        """Decoder prediction size = b_patch * p^2 * in_chans."""
        return self.b_patch_size * self.patch_size**2 * self.in_chans

    @property
    def fusion_depth(self) -> int:
        """Number of joint ('fusion') blocks; 0 when s_depth >= 12 (ref quirk)."""
        return self.depth - self.s_depth if self.s_depth < 12 else 0

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


# Published size presets. [depth, dim, s_depth] = [12, 128, 9] for Base and
# [12, 256, 9] for Large (`/root/reference/Model_Pretraining.py:130`);
# decoder [depth, dim] = [8, 64] (`:131`). "Small" matches the
# `mask_pretraining` signature defaults (`/root/reference/Model_Pretraining.py:57`).
PRESETS = {
    "HSIMAE-S": ModelConfig(embed_dim=64, depth=12, s_depth=6, decoder_dim=48, decoder_depth=2),
    "HSIMAE-B": ModelConfig(embed_dim=128, depth=12, s_depth=9, decoder_dim=64, decoder_depth=8),
    "HSIMAE-L": ModelConfig(embed_dim=256, depth=12, s_depth=9, decoder_dim=64, decoder_depth=8),
}


def preset(name: str, **overrides) -> ModelConfig:
    return PRESETS[name].replace(**overrides)


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    """MAE pretraining hyperparameters (`/root/reference/Model_Pretraining.py:119-134`)."""

    mask_ratio: float = 0.5
    lr: float = 5e-3
    weight_decay: float = 5e-2
    batch_size: int = 512
    epochs: int = 100
    warmup_frac: float = 0.05  # fraction of total iters (`Model_Pretraining.py:88`)
    lr_min: float = 1e-6
    adam_b1: float = 0.9
    adam_b2: float = 0.95
    # store Adam's first moment in this dtype (None = f32). "bfloat16" cuts
    # optimizer-state HBM traffic; the update math still runs in f32 and the
    # second moment stays f32 (see train/optim.adamw).
    adam_mu_dtype: Optional[str] = None
    seed: int = 42
    log_every: int = 50
    checkpoint_every_steps: int = 0  # 0 = only save at end (reference behavior)
    # "msgpack" (synchronous, one self-contained file per checkpoint) or
    # "orbax" (async background saves + managed retention + sharding-aware
    # restore; see checkpoints/orbax_io.py). Both satisfy test_resume.py.
    checkpoint_backend: str = "msgpack"
    # orbax-managed retention: checkpoints kept on disk (None = keep all).
    # The default 3 can be too aggressive for multi-day pretrains — raise it
    # via --ckpt-max-keep. Ignored by the msgpack backend (which keeps all).
    ckpt_max_to_keep: Optional[int] = 3
    # steps fused into one dispatch by lax.scan (0 = eager per-step path).
    # Default 0: the eager two-program loop (gather jit + step jit) measures
    # ~71k patches/s at bs=512 and ~336k at bs=2048 on the target chip after
    # warmup; fusing buys nothing here and costs a much longer compile.
    fused_steps: int = 0


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    """Dual-branch fine-tuning hyperparameters (`/root/reference/Model_Finetuning.py:66,304-329`)."""

    mask_ratio: float = 0.8
    lamda: float = 10.0  # loss = lamda * rec + ce  (`Model_Finetuning.py:154`)
    lr: float = 1e-3
    weight_decay: float = 5e-3
    batch_size: int = 32
    epochs: int = 200
    warmup_frac: float = 0.1  # of epochs; per-epoch schedule (`:105-107`)
    drop_path: float = 0.2
    train_ratio: float = 0.5  # labeled train/val split (`:111`)
    val_batch_size: int = 512
    seed: int = 3407
    # lr multiplier for all non-cls_head params. 1.0 = the reference's
    # uniform-lr AdamW (exact parity); 0.0 = frozen encoder (linear-probe
    # head training). See train/optim.py::finetune_optimizer for why.
    encoder_lr_scale: float = 1.0


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Full-scene inference (`/root/reference/Model_Finetuning.py:243-301`)."""

    batch_size: int = 4096  # device-side patch gather; ref used 256 host patches
    save_colormaps: bool = True


@dataclasses.dataclass(frozen=True)
class ProtocolConfig:
    """The multi-seed selection/test protocol (`/root/reference/Model_Finetuning.py:304-429`)."""

    seeds: Tuple[int, ...] = (3407, 3408, 3409, 3410, 3411)
    selection_seeds: int = 3
    test_seeds: int = 5
    lr_grid: Tuple[float, ...] = (5e-3, 1e-3, 5e-4, 1e-4)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit sharding (no reference analogue: the
    reference is single-GPU, `/root/reference/Model_Pretraining.py:59`)."""

    data: int = -1  # -1: all remaining devices
    model: int = 1  # tensor-parallel axis (heads / mlp hidden)
