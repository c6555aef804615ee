"""Torch -> flax weight converters for the baseline zoo.

Extends the HSIMAE converter's rules (`hsimae_tpu/checkpoints/torch_convert.py`)
with the generic Conv1d/2d/3d and BatchNorm mappings the zoo needs, plus
per-model name maps for the quirk-heavy methods (SSFTT, SpectralFormer, SSRN,
RSSAN). These exist so converted-weights logits-parity tests can pin each
flax re-implementation against its torch oracle in
`/root/reference/Compared_Methods/` — and so users can carry trained
reference checkpoints over.

Generic rules:
* Linear ``weight [out, in]``        -> ``kernel [in, out]``
* ConvNd ``weight [out, in, *k]``    -> ``kernel [*k, in, out]``
* BatchNorm ``weight``/``bias``      -> params ``scale``/``bias``;
  ``running_mean``/``running_var``   -> batch_stats ``mean``/``var``
* LayerNorm ``weight``               -> ``scale``

Each converter returns a flax variables dict ``{"params": ...,
"batch_stats": ...}`` (batch_stats omitted when the model has none).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from hsimae_tpu.checkpoints.io import _unflatten


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def conv_kernel(w) -> np.ndarray:
    """torch ConvNd weight [out, in, *k] -> flax kernel [*k, in, out]."""
    w = _np(w)
    return w.transpose(*range(2, w.ndim), 1, 0)


def linear_kernel(w) -> np.ndarray:
    return _np(w).T


class _Tree:
    """Accumulates flat (path, leaf) pairs for params and batch_stats."""

    def __init__(self):
        self.params: Dict[Tuple[str, ...], np.ndarray] = {}
        self.stats: Dict[Tuple[str, ...], np.ndarray] = {}

    def linear(self, sd, tname: str, *fpath: str):
        self.params[(*fpath, "kernel")] = linear_kernel(sd[f"{tname}.weight"])
        if f"{tname}.bias" in sd:
            self.params[(*fpath, "bias")] = _np(sd[f"{tname}.bias"])

    def conv(self, sd, tname: str, *fpath: str):
        self.params[(*fpath, "kernel")] = conv_kernel(sd[f"{tname}.weight"])
        if f"{tname}.bias" in sd:
            self.params[(*fpath, "bias")] = _np(sd[f"{tname}.bias"])

    def bn(self, sd, tname: str, *fpath: str):
        self.params[(*fpath, "scale")] = _np(sd[f"{tname}.weight"])
        self.params[(*fpath, "bias")] = _np(sd[f"{tname}.bias"])
        self.stats[(*fpath, "mean")] = _np(sd[f"{tname}.running_mean"])
        self.stats[(*fpath, "var")] = _np(sd[f"{tname}.running_var"])

    def ln(self, sd, tname: str, *fpath: str):
        self.params[(*fpath, "scale")] = _np(sd[f"{tname}.weight"])
        self.params[(*fpath, "bias")] = _np(sd[f"{tname}.bias"])

    def raw(self, value, *fpath: str):
        self.params[fpath] = _np(value)

    def variables(self) -> dict:
        out = {"params": _unflatten(self.params)}
        if self.stats:
            out["batch_stats"] = _unflatten(self.stats)
        return out


def convert_ssftt(sd: dict, kernel_3d: int = 8) -> dict:
    """`/root/reference/Compared_Methods/SSFTT.py:112-176` -> zoo ``SSFTT``.

    The reference merges the Conv3d output channels c-major
    (``'b c h w y -> b (c h) w y'``, `SSFTT.py:156`: merged index = c*S + s)
    while the flax model merges s-major (s*C + c), so the Conv2d kernel's
    input channels are permuted to match.
    """
    t = _Tree()
    t.conv(sd, "conv3d_features.0", "conv3d")
    t.bn(sd, "conv3d_features.1", "bn3d")

    w = conv_kernel(sd["conv2d_features.0.weight"])  # [kh, kw, C*S, out]
    kh, kw, cin, cout = w.shape
    s = cin // kernel_3d
    w = w.reshape(kh, kw, kernel_3d, s, cout).transpose(0, 1, 3, 2, 4)
    t.params[("conv2d", "kernel")] = w.reshape(kh, kw, cin, cout)
    t.params[("conv2d", "bias")] = _np(sd["conv2d_features.0.bias"])
    t.bn(sd, "conv2d_features.1", "bn2d")

    t.raw(_np(sd["token_wA"])[0], "token_wA")     # [1, L, C]  -> [L, C]
    t.raw(_np(sd["token_wV"])[0], "token_wV")     # [1, C, d]  -> [C, d]
    t.raw(sd["cls_token"], "cls_token")
    t.raw(sd["pos_embedding"], "pos_embedding")

    depth = 1 + max(
        (int(k.split(".")[2]) for k in sd if k.startswith("transformer.layers.")),
        default=-1,
    )
    for i in range(depth):
        p = f"transformer.layers.{i}"
        t.ln(sd, f"{p}.0.fn.norm", "transformer", f"norm1_{i}")
        t.linear(sd, f"{p}.0.fn.fn.to_qkv", "transformer", f"attn_{i}", "qkv")
        t.linear(sd, f"{p}.0.fn.fn.nn1", "transformer", f"attn_{i}", "proj")
        t.ln(sd, f"{p}.1.fn.norm", "transformer", f"norm2_{i}")
        t.linear(sd, f"{p}.1.fn.fn.net.0", "transformer", f"mlp_{i}", "Dense_0")
        t.linear(sd, f"{p}.1.fn.fn.net.3", "transformer", f"mlp_{i}", "Dense_1")
    t.linear(sd, "nn1", "head")
    return t.variables()


def convert_spectralformer(sd: dict) -> dict:
    """`/root/reference/Compared_Methods/SpectralFormer.py:139-179` (CAF mode)
    -> zoo ``SpectralFormer``."""
    t = _Tree()
    t.conv(sd, "patch_to_embedding.embed", "gse")  # Conv1d [d, px, k] -> [k, px, d]
    t.raw(sd["cls_token"], "cls_token")
    t.raw(sd["pos_embedding"], "pos_embedding")
    depth = 1 + max(
        (int(k.split(".")[2]) for k in sd if k.startswith("transformer.layers.")),
        default=-1,
    )
    for i in range(depth):
        p = f"transformer.layers.{i}"
        t.ln(sd, f"{p}.0.fn.norm", f"norm1_{i}")
        t.linear(sd, f"{p}.0.fn.fn.to_qkv", f"attn_{i}", "qkv")
        t.linear(sd, f"{p}.0.fn.fn.to_out.0", f"attn_{i}", "proj")
        t.ln(sd, f"{p}.1.fn.norm", f"norm2_{i}")
        t.linear(sd, f"{p}.1.fn.fn.net.0", f"mlp_{i}", "Dense_0")
        t.linear(sd, f"{p}.1.fn.fn.net.3", f"mlp_{i}", "Dense_1")
    for j in range(depth - 2):
        t.conv(sd, f"transformer.skipcat.{j}", f"skipcat_{j}")
    t.ln(sd, "mlp_head.0", "head_norm")
    t.linear(sd, "mlp_head.1", "head")
    return t.variables()


def convert_ssrn(sd: dict) -> dict:
    """`/root/reference/Compared_Methods/SSRN.py:35-90` -> zoo ``SSRN``."""
    t = _Tree()
    t.conv(sd, "conv1", "conv1")
    t.bn(sd, "batch_norm1.0", "bn1")
    for i in (1, 2, 3, 4):
        t.conv(sd, f"res_net{i}.conv1.0", f"res{i}", "conv1")
        t.conv(sd, f"res_net{i}.conv2", f"res{i}", "conv2")
        t.bn(sd, f"res_net{i}.bn1", f"res{i}", "bn1")
        t.bn(sd, f"res_net{i}.bn2", f"res{i}", "bn2")
    t.conv(sd, "conv2", "conv2")
    t.bn(sd, "batch_norm2.0", "bn2")
    t.conv(sd, "conv3", "conv3")
    t.bn(sd, "batch_norm3.0", "bn3")
    t.linear(sd, "full_connection.1", "fc")
    return t.variables()


def convert_dbda(sd: dict) -> dict:
    """`/root/reference/Compared_Methods/DBDA.py:100-218` -> zoo ``DBDA``."""
    t = _Tree()
    for i in (11, 12, 13, 14, 15):
        t.conv(sd, f"conv{i}", f"conv{i}")
    for i in (11, 12, 13, 14):
        t.bn(sd, f"batch_norm{i}.0", f"bn{i}")
    for i in (21, 22, 23, 24):
        t.conv(sd, f"conv{i}", f"conv{i}")
    for i in (21, 22, 23):
        t.bn(sd, f"batch_norm{i}.0", f"bn{i}")
    t.raw(sd["attention_spectral.gamma"], "cam", "gamma")
    t.raw(sd["attention_spatial.gamma"], "pam", "gamma")
    t.conv(sd, "attention_spatial.query_conv", "pam", "query")
    t.conv(sd, "attention_spatial.key_conv", "pam", "key")
    t.conv(sd, "attention_spatial.value_conv", "pam", "value")
    t.linear(sd, "full_connection.1", "fc")
    return t.variables()


def convert_fdssc(sd: dict) -> dict:
    """`/root/reference/Compared_Methods/FDSSC.py:134-252` (``FDSSC_f``, the
    variant the reference harness runs) -> zoo ``FDSSC``.

    The Conv1d spectral stack maps to (1,1,k) 3-D kernels and the Conv2d
    spatial stack to (3,3,1) kernels (conv6's 200 input channels fold into
    the spectral axis, so its kernel becomes (3,3,200) with 1 feature).
    PReLU's torch weight [1] reshapes to flax's scalar ``negative_slope``.
    """
    t = _Tree()
    for i in (1, 2, 3, 4, 5):  # Conv1d [out, in, k] -> [1, 1, k, in, out]
        w = conv_kernel(sd[f"conv{i}.weight"])  # [k, in, out]
        t.params[(f"conv{i}", "kernel")] = w.reshape(1, 1, *w.shape)
        t.params[(f"conv{i}", "bias")] = _np(sd[f"conv{i}.bias"])
    w = conv_kernel(sd["conv6.weight"])  # [3, 3, 200, 24]
    t.params[("conv6", "kernel")] = w.reshape(3, 3, w.shape[2], 1, w.shape[3])
    t.params[("conv6", "bias")] = _np(sd["conv6.bias"])
    for i in (7, 8, 9):  # Conv2d [out, in, 3, 3] -> [3, 3, 1, in, out]
        w = conv_kernel(sd[f"conv{i}.weight"])  # [3, 3, in, out]
        t.params[(f"conv{i}", "kernel")] = w.reshape(3, 3, 1, *w.shape[2:])
        t.params[(f"conv{i}", "bias")] = _np(sd[f"conv{i}.bias"])
    for i in range(1, 10):
        t.bn(sd, f"batch_norm{i}.0", f"bn{i}")
        t.params[(f"prelu{i}", "negative_slope")] = _np(
            sd[f"batch_norm{i}.1.weight"]).reshape(())
    t.linear(sd, "full_connection.1", "fc")
    return t.variables()


def _spectral_attention(t: _Tree, sd: dict, tname: str, *fpath: str):
    t.linear(sd, f"{tname}.SharedMLP.0", *fpath, "fc1")
    t.linear(sd, f"{tname}.SharedMLP.2", *fpath, "fc2")


def convert_rssan(sd: dict) -> dict:
    """`/root/reference/Compared_Methods/RSSAN.py:75-114` -> zoo ``RSSAN``.

    Only the torch modules the reference forward actually RUNS are mapped:
    ``SSA_Module.conv2`` and the top-level ``ssa3`` are dead parameters
    (`RSSAN.py:62-66,108-110`) and have no flax counterpart. ``ssa1`` is
    applied twice, matching the reference's reuse.
    """
    t = _Tree()
    _spectral_attention(t, sd, "attention1", "attn1")
    t.conv(sd, "attention2.conv1", "attn2", "conv")
    t.conv(sd, "conv1", "conv1")
    t.bn(sd, "bn1", "bn1")
    for name in ("ssa1", "ssa2"):
        t.conv(sd, f"{name}.conv1", name, "conv1")
        t.bn(sd, f"{name}.bn1", name, "bn1")
        t.bn(sd, f"{name}.bn2", name, "bn2")
        _spectral_attention(t, sd, f"{name}.spe_attention", name, "spe")
        t.conv(sd, f"{name}.spa_attention.conv1", name, "spa", "conv")
    t.linear(sd, "full_connection.0", "fc")
    return t.variables()
