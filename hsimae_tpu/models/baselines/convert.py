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


def convert_hybridformer(sd: dict, patch_sizes=(3, 5)) -> dict:
    """`/root/reference/Compared_Methods/HybridFormer.py:185-227` -> zoo
    ``HybridFormer``. Unused reference parameters (per-branch cls_token, the
    patchify DEPTHWISECONV's point_conv, spatial_norm/spectral_norm) have no
    flax counterpart and are skipped."""
    t = _Tree()
    for i, c in enumerate(("conv1", "conv2", "conv3", "out_conv"), start=1):
        t.conv(sd, f"ournet.{c}.0", "ournet", c if c == "out_conv" else f"conv{i}")
        t.bn(sd, f"ournet.{c}.1", "ournet", f"bn{i}")
    t.conv(sd, "conv4", "conv4")
    depth = 1 + max(
        int(k.split(".")[4]) for k in sd if ".transformer.layers." in k
    )
    for i, ps in enumerate(patch_sizes):
        sub = f"sub_{ps}"
        t.conv(sd, f"net.{i}.to_patch_embedding.0.depth_conv", sub, "patch_dw")
        t.raw(sd[f"net.{i}.pos_embedding"], sub, "pos_embedding")
        for j in range(depth):
            p = f"net.{i}.transformer.layers.{j}"
            t.ln(sd, f"{p}.0.norm", sub, f"norm1_{j}")
            a = (sub, f"attn_{j}")
            t.linear(sd, f"{p}.0.fn.to_qkv", *a, "qkv")
            t.linear(sd, f"{p}.0.fn.to_out.0", *a, "proj")
            t.conv(sd, f"{p}.0.fn.spatial_conv", *a, "spatial_conv")
            t.conv(sd, f"{p}.0.fn.spectral_conv", *a, "spectral_conv")
            t.linear(sd, f"{p}.0.fn.to_qkv_spec", *a, "qkv_spec")
            t.ln(sd, f"{p}.1.norm", sub, f"norm2_{j}")
            f = (sub, f"ffn_{j}")
            t.conv(sd, f"{p}.1.fn.net.0.depth_conv", *f, "dw")
            t.conv(sd, f"{p}.1.fn.net.0.point_conv", *f, "pw")
            t.bn(sd, f"{p}.1.fn.net.1", *f, "bn")
            t.conv(sd, f"{p}.1.fn.net.2", *f, "fc1")
            t.conv(sd, f"{p}.1.fn.net.4", *f, "fc2")
        t.ln(sd, f"mlp_head.{i}.0", f"head_norm_{ps}")
        t.linear(sd, f"mlp_head.{i}.1", f"head_{ps}")
    return t.variables()


def _chan_ln(t: _Tree, sd: dict, tname: str, *fpath: str):
    """ChanLayerNorm g/b [1, C, 1, 1] -> LayerNorm scale/bias [C]
    (`GSCViT.py:77-88`; same biased-variance math, channels-last here)."""
    t.params[(*fpath, "scale")] = _np(sd[f"{tname}.g"]).reshape(-1)
    t.params[(*fpath, "bias")] = _np(sd[f"{tname}.b"]).reshape(-1)


def _conv1d_as_dense(t: _Tree, sd: dict, tname: str, *fpath: str):
    """Conv1d(k=1) over channels ≡ Dense on channels-last tokens."""
    t.params[(*fpath, "kernel")] = _np(sd[f"{tname}.weight"])[:, :, 0].T
    if f"{tname}.bias" in sd:
        t.params[(*fpath, "bias")] = _np(sd[f"{tname}.bias"])


def convert_gscvit(sd: dict) -> dict:
    """`/root/reference/Compared_Methods/GSCViT.py:248-444` -> zoo ``GSCViT``.
    ``conv_last`` is a dead reference parameter (never called) — skipped."""
    t = _Tree()
    t.conv(sd, "sc.conv", "sc_conv")
    t.bn(sd, "sc.bn", "sc_bn")
    t.bn(sd, "bn_1", "bn_1")
    stages = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("layers_trans.")
    )
    for i in range(stages):
        s = f"layers_trans.{i}"
        t.conv(sd, f"{s}.0.gpwc", f"gsc_{i}", "gpwc")
        t.conv(sd, f"{s}.0.gc", f"gsc_{i}", "gc")
        t.bn(sd, f"{s}.0.bn", f"gsc_{i}", "bn")
        depth = 1 + max(
            int(k.split(".")[4]) for k in sd
            if k.startswith(f"{s}.1.layers.")
        )
        for j in range(depth):
            p = f"{s}.1.layers.{j}"
            _chan_ln(t, sd, f"{p}.norm", f"prenorm_{i}_{j}")
            g = f"gssa_{i}_{j}"
            _conv1d_as_dense(t, sd, f"{p}.fn.to_qkv", g, "to_qkv")
            t.raw(sd[f"{p}.fn.group_tokens"], g, "group_token")
            t.ln(sd, f"{p}.fn.group_tokens_to_qk.0", g, "gt_norm")
            _conv1d_as_dense(t, sd, f"{p}.fn.group_tokens_to_qk.3", g, "gt_qk")
            t.conv(sd, f"{p}.fn.to_out.0", g, "to_out")
        if f"{s}.1.norm.g" in sd:  # norm_output only on non-last stages
            _chan_ln(t, sd, f"{s}.1.norm", f"postnorm_{i}")
        t.bn(sd, f"{s}.2", f"stage_bn_{i}")
        t.conv(sd, f"{s}.4", f"pw_{i}")
    t.ln(sd, "mlp_head.1", "head_norm")
    t.linear(sd, "mlp_head.2", "head")
    return t.variables()


def _dynamic_conv3d(t: _Tree, sd: dict, tname: str, fname: str):
    """``Dynamic_conv3d`` (`HiT.py:82-126`): kernel-attention Dense pair,
    nattention3d local gate, and the K-kernel bank
    [K, out, in, kd, kh, kw] -> [K, kd, kh, kw, in, out]."""
    for fc in ("fc1", "fc2"):  # Conv3d 1x1x1, no bias == Dense
        t.params[(fname, fc, "kernel")] = _np(
            sd[f"{tname}.attention.{fc}.weight"])[:, :, 0, 0, 0].T
    t.conv(sd, f"{tname}.local.a", fname, "a")
    t.bn(sd, f"{tname}.local.bn", fname, "bn")
    t.conv(sd, f"{tname}.local.b", fname, "b")
    t.params[(fname, "weight")] = _np(
        sd[f"{tname}.weight"]).transpose(0, 3, 4, 5, 2, 1)


def convert_hit(sd: dict, layers, transitions, embed_dims) -> dict:
    """`/root/reference/Compared_Methods/HiT.py:312-384` -> zoo ``HiT``
    (ConvPermuteMLP mixer, the reference default). Dead reference parameters
    (``conv_cls_head``, the dynamic convs' unused bias) are skipped."""
    t = _Tree()
    _dynamic_conv3d(t, sd, "patch_embed.proj1_1", "proj1_1")
    _dynamic_conv3d(t, sd, "patch_embed.proj2_1", "proj2_1")
    n = 0  # ref network index: stages and Downsamples interleaved
    for i, n_blocks in enumerate(layers):
        for j in range(n_blocks):
            p = f"network.{n}.{j}"
            blk = f"block_{i}_{j}"
            t.ln(sd, f"{p}.norm1", blk, "norm1")
            t.conv(sd, f"{p}.attn.mlp_c.0", blk, "attn", "mlp_c")
            t.conv(sd, f"{p}.attn.mlp_h.0", blk, "attn", "mlp_h")
            t.conv(sd, f"{p}.attn.mlp_w", blk, "attn", "mlp_w")
            t.linear(sd, f"{p}.attn.reweight.fc1", blk, "attn", "reweight", "Dense_0")
            t.linear(sd, f"{p}.attn.reweight.fc2", blk, "attn", "reweight", "Dense_1")
            t.linear(sd, f"{p}.attn.proj", blk, "attn", "proj")
            t.ln(sd, f"{p}.norm2", blk, "norm2")
            t.linear(sd, f"{p}.mlp.fc1", blk, "mlp", "Dense_0")
            t.linear(sd, f"{p}.mlp.fc2", blk, "mlp", "Dense_1")
        n += 1
        if i < len(layers) - 1 and (
            transitions[i] or embed_dims[i] != embed_dims[i + 1]
        ):
            t.conv(sd, f"network.{n}.proj", f"downsample_{i}")
            n += 1
    t.ln(sd, "norm", "norm")
    t.linear(sd, "head", "head")
    return t.variables()


def convert_dctn(sd: dict, layers, transitions, embed_dims) -> dict:
    """`/root/reference/Compared_Methods/DCTN.py:244-348` -> zoo ``DCTN``.
    Dead reference parameters (EISA's unused ``conv``, the model-level
    ``gamma1``/``gamma3``/``weights``/``conv_cls_head``) are skipped."""
    t = _Tree()
    pe = "patch_embed"
    t.conv(sd, f"{pe}.proj", pe, "proj")
    t.conv(sd, f"{pe}.proj2", pe, "proj2")
    t.bn(sd, f"{pe}.bn", pe, "bn")
    t.conv(sd, f"{pe}.conv_1", pe, "conv_1")
    t.bn(sd, f"{pe}.bn_1", pe, "bn_1")
    for m in ("conv1", "conv2", "conv3"):
        t.conv(sd, f"{pe}.add2D.{m}", pe, "add2d", m)
        t.bn(sd, f"{pe}.add2D.{m.replace('conv', 'bn')}", pe, "add2d",
             m.replace("conv", "bn"))
    t.conv(sd, f"{pe}.down_sample", pe, "down_sample")
    t.raw(sd[f"{pe}.weights"], pe, "weights")

    n = 0
    for i, n_blocks in enumerate(layers):
        for j in range(n_blocks):
            p = f"network.{n}.{j}"
            blk = f"block_{i}_{j}"
            t.ln(sd, f"{p}.norm1", blk, "norm1")  # GroupNorm w/b [C]
            a = (blk, "attn")
            for m in ("mlp_h", "mlp_w", "mlp_s", "convH", "convH2", "mix_hw",
                      "mix_hw2", "mix_hws", "mix_hws2", "mix_all"):
                t.conv(sd, f"{p}.attn.{m}", *a, m)
            t.linear(sd, f"{p}.attn.linearH", *a, "linearH")
            t.linear(sd, f"{p}.attn.linearW", *a, "linearW")
            t.linear(sd, f"{p}.attn.proj", *a, "proj")
            t.raw(sd[f"{p}.attn.weights"], *a, "weights")
            t.ln(sd, f"{p}.norm2", blk, "norm2")
            t.conv(sd, f"{p}.mlp.Conv1", blk, "mlp", "conv1")
            t.conv(sd, f"{p}.mlp.proj1", blk, "mlp", "proj1")
            t.conv(sd, f"{p}.mlp.Conv2", blk, "mlp", "conv2")
        n += 1
        if i < len(layers) - 1 and (
            transitions[i] or embed_dims[i] != embed_dims[i + 1]
        ):
            t.conv(sd, f"network.{n}.proj", f"downsample_{i}")
            n += 1

    for m in ("conv2", "conv2_2", "conv3", "conv3_2", "conv4", "conv4_2"):
        t.conv(sd, m, m)
        t.bn(sd, f"bn{m[4:]}", f"bn{m[4:]}")
    t.conv(sd, "down_sample.proj", "down_sample")
    t.conv(sd, "ConvEnd", "conv_end")
    t.ln(sd, "norm", "norm")
    t.linear(sd, "head", "head")
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
