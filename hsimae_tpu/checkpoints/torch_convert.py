"""Convert published PyTorch HSIMAE checkpoints to this framework's pytrees.

The reference publishes pretrained ``state_dict`` files on Hugging Face
(`/root/reference/README.md:37`) with the module names of ``Models.py``:

  patch_embed.proj.{weight,bias}          Conv3d [C, 1, u, p, p]
  blocks_1.{i}. / blocks_2.{i}. / blocks.{i}.
      norm1.{weight,bias}  attn.{q,k,v,proj}.{weight,bias}
      norm2.{weight,bias}  mlp.{w1,w2,w3}.{weight,bias}
  norm.{weight,bias}
  pos_embed / decoder_pos_embed           frozen sincos (not loaded: we
                                          recompute; optionally verified)
  mask_token                              dead parameter (`Models.py:401`,
                                          never used in forward) — dropped
  decoder_embed / decoder_pred .{weight,bias}
  decoder_blocks.{i}.* / decoder_norm.*
  cls_head.{weight,bias}                  (DualViT / HSIViT only)

Conversion rules: torch ``Linear.weight [out, in]`` -> flax ``kernel
[in, out]`` (transpose); LayerNorm ``weight`` -> ``scale``; the Conv3d
patch-proj kernel flattens to ``[u*p*p, C]`` — its kernel==stride makes it a
Dense over pixels in (u, p_row, p_col) order, exactly PatchEmbed's feature
order here.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from hsimae_tpu.checkpoints.io import _unflatten


_SKIP = re.compile(r"^(pos_embed|decoder_pos_embed|mask_token)$")


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def convert_torch_state_dict(state_dict: Dict[str, "np.ndarray"]) -> dict:
    """torch name->tensor mapping  ->  flax params dict (nested)."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for name, tensor in state_dict.items():
        if _SKIP.fullmatch(name):
            continue
        arr = _to_numpy(tensor)
        parts = name.split(".")

        # list-module indices fold into the parent name: blocks_1.3 -> blocks_1_3
        merged = []
        for p in parts:
            if merged and p.isdigit():
                merged[-1] = f"{merged[-1]}_{p}"
            else:
                merged.append(p)
        parts = merged

        leaf = parts[-1]
        scope = parts[:-1]

        if name.startswith("patch_embed.proj"):
            if leaf == "weight":
                c = arr.shape[0]
                flat[("patch_embed", "proj", "kernel")] = arr.reshape(c, -1).T
            else:
                flat[("patch_embed", "proj", "bias")] = arr
            continue

        is_norm = scope and ("norm" in scope[-1])
        if is_norm:
            flat[tuple(scope) + (("scale" if leaf == "weight" else "bias"),)] = arr
        elif leaf == "weight":
            flat[tuple(scope) + ("kernel",)] = arr.T
        elif leaf == "bias":
            flat[tuple(scope) + ("bias",)] = arr
        else:
            # unknown leaf: keep verbatim so partial_restore can skip it loudly
            flat[tuple(parts)] = arr
    return _unflatten(flat)


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch ``.pkl``/``.pth`` state_dict and convert. Torch is only
    imported here so the rest of the framework never depends on it."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd and all(
        not hasattr(v, "shape") for k, v in sd.items() if k != "state_dict"
    ):
        sd = sd["state_dict"]
    return convert_torch_state_dict(sd)


def export_torch_state_dict(params: dict, cfg) -> Dict[str, np.ndarray]:
    """Inverse conversion: flax params -> torch-style state_dict names, for
    round-trip tests and for users moving back to the reference."""
    from hsimae_tpu.checkpoints.io import _flatten
    from hsimae_tpu.models.pos_embed import sincos_3d

    out: Dict[str, np.ndarray] = {}
    for path, leaf in _flatten(params).items():
        arr = np.asarray(leaf)
        parts = [re.sub(r"_(\d+)$", r".\1", p) for p in path]
        leafname = parts[-1]
        scope = ".".join(parts[:-1])
        if scope == "patch_embed.proj" and leafname == "kernel":
            c = arr.shape[-1]
            u, p = cfg.b_patch_size, cfg.patch_size
            out[f"{scope}.weight"] = arr.T.reshape(c, 1, u, p, p)
        elif leafname == "kernel":
            out[f"{scope}.weight"] = arr.T
        elif leafname == "scale":
            out[f"{scope}.weight"] = arr
        else:
            out[f"{scope}.{leafname}"] = arr
    # frozen tables the reference stores as Parameters
    out["pos_embed"] = sincos_3d(cfg.embed_dim, cfg.t_size, cfg.grid_size)[None]
    if any(k.startswith("decoder_") for k in out):
        out["decoder_pos_embed"] = sincos_3d(cfg.decoder_dim, cfg.t_size, cfg.grid_size)[None]
        out["mask_token"] = np.zeros((1, 1, cfg.decoder_dim), np.float32)
    return out
