"""AOT export / load of the HSIViT classifier for production serving.

Replaces the reference's deploy story (ship ``Models.py`` + a torch ``.pkl``
and re-run the eval loop of ``/root/reference/Model_Finetuning.py:243-301``)
with the XLA-native one: :func:`jax.export.export` lowers the jitted
classifier forward to serialized StableHLO once, at a fixed set of batch
buckets, for both ``cpu`` and ``tpu``. The artifact is a single msgpack file
bundling the programs, the trained params, and the model metadata; loading
it needs jax only (no flax, no model source) and inherits jax.export's
cross-version compatibility window.

Static batch buckets are the TPU serving discipline: XLA programs have
static shapes, so a request of ``n`` patches is padded up to the smallest
bucket >= n (one program load per bucket, then cached by the runtime), and
requests above the largest bucket stream through it in chunks.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from flax import serialization
from jax import export as jax_export

from hsimae_tpu.config import ModelConfig
from hsimae_tpu.models.hsimae import CLS_HEAD_NAME, HSIMAE, build_hsi_vit, init_model
from hsimae_tpu.checkpoints.io import partial_restore, uncovered_leaves

ARTIFACT_VERSION = 1
DEFAULT_BUCKETS = (1, 64, 1024)
_Q8_KEYS = frozenset({"q8", "scale"})


def quantize_params_int8(params: dict) -> dict:
    """Weight-only int8: every 2-D float kernel becomes ``{"q8": int8,
    "scale": f32 [1, out]}`` (symmetric, per-output-channel). 1-D leaves
    (biases, LayerNorm scales) and the tiny patch-embed stay exact enough
    that only matmul weights are worth quantizing — they are ~97% of the
    parameter bytes in every HSIMAE size preset."""
    import jax.numpy as jnp

    def q(a):
        a = np.asarray(a)
        # jnp.issubdtype, not np.issubdtype: ml_dtypes' bfloat16 (what a
        # params_dtype='bfloat16' cast produces) is NOT an np.floating
        # subdtype, and silently skipping it would ship an unquantized
        # artifact stamped quantize='int8'
        if a.ndim == 2 and jnp.issubdtype(a.dtype, jnp.floating):
            af = a.astype(np.float32)
            s = np.max(np.abs(af), axis=0, keepdims=True) / 127.0
            s = np.where(s == 0, np.float32(1.0), s).astype(np.float32)
            qa = np.clip(np.round(af / s), -127, 127).astype(np.int8)
            return {"q8": qa, "scale": s}
        return a

    def walk(t):
        if isinstance(t, dict):
            return {k: walk(v) for k, v in t.items()}
        return q(t)

    return walk(params)


def dequantize_params(params, dtype):
    """Inverse of :func:`quantize_params_int8`; traceable, so the exported
    StableHLO carries the (XLA-fused) int8->float expansion and the artifact
    ships int8 weights."""
    if isinstance(params, dict):
        if set(params.keys()) == _Q8_KEYS:
            return params["q8"].astype(dtype) * params["scale"].astype(dtype)
        return {k: dequantize_params(v, dtype) for k, v in params.items()}
    return params


def _abstractify(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), tree)


def export_classifier(
    params: dict,
    model_cfg: ModelConfig,
    num_classes: int,
    batch_sizes: Sequence[int] = DEFAULT_BUCKETS,
    platforms: Sequence[str] = ("cpu", "tpu"),
    params_dtype: Optional[str] = None,
    quantize: Optional[str] = None,
) -> bytes:
    """Serialize an HSIViT classifier into a self-contained artifact.

    ``params`` may be any checkpoint covering the encoder + cls head (a
    fine-tuned DualViT tree works — key-intersection restore, the same rule
    as `/root/reference/Model_Finetuning.py`'s eval path); a checkpoint that
    leaves the cls head uncovered is rejected.

    ``params_dtype='bfloat16'`` casts float params before export — half the
    artifact/HBM size, the standard TPU serving dtype (pair it with a
    ``model_cfg`` whose ``compute_dtype`` is bf16 for an all-bf16 forward).

    ``quantize='int8'`` additionally stores matmul kernels as weight-only
    int8 (per-output-channel symmetric scales; ~4x smaller than f32). The
    dequantization is baked into the exported program, so loading/serving
    code is unchanged; measured logits error is sub-1% relative L2 on
    HSIViT and label decisions are unaffected (tests/test_serving.py).
    """
    if quantize not in (None, "int8"):
        raise ValueError(f"unsupported quantize={quantize!r} (only 'int8')")
    model = build_hsi_vit(model_cfg, num_classes)
    tgt = init_model(model, seed=0)["params"]
    params, loaded, _ = partial_restore(tgt, params, verbose=False)
    uncovered = uncovered_leaves(tgt, loaded)
    if any(p[0] == CLS_HEAD_NAME for p in uncovered):
        raise ValueError(
            f"checkpoint does not cover {CLS_HEAD_NAME} — wrong num_classes "
            "or a pretrain-only checkpoint?")
    if uncovered:
        # unlike classify_scene's transient warning, an export FREEZES the
        # params into a deployed artifact — random-init leaves are forever
        import warnings

        warnings.warn(
            f"export leaves {len(uncovered)} target leaves at random init "
            "(model args do not match the checkpoint?); the artifact will "
            "produce meaningless predictions", stacklevel=2)
    params = jax.device_get(params)
    return export_flax_classifier(
        model, {"params": params}, num_classes,
        (model_cfg.img_size, model_cfg.img_size, model_cfg.bands),
        batch_sizes=batch_sizes, platforms=platforms, quantize=quantize,
        params_dtype=params_dtype,
        apply_method=HSIMAE.classify, meta=dataclasses.asdict(model_cfg))


def export_flax_classifier(
    model,
    variables: dict,
    num_classes: int,
    input_shape: Tuple[int, ...],
    batch_sizes: Sequence[int] = DEFAULT_BUCKETS,
    platforms: Sequence[str] = ("cpu", "tpu"),
    params_dtype: Optional[str] = None,
    quantize: Optional[str] = None,
    apply_method=None,
    meta: Optional[dict] = None,
) -> bytes:
    """Generic AOT export: ANY flax classifier whose eval forward is
    ``model.apply(variables, x, False)`` — every model in the baselines zoo
    qualifies (`hsimae_tpu/models/baselines/`), incl. BatchNorm models
    (pass ``{"params": ..., "batch_stats": ...}``). ``input_shape`` is the
    per-example shape (e.g. ``(15, 15, 30)``); ``meta`` is stored verbatim
    as the artifact's ``model_cfg`` metadata."""
    import jax.numpy as jnp

    if quantize not in (None, "int8"):
        raise ValueError(f"unsupported quantize={quantize!r} (only 'int8')")
    variables = jax.device_get(variables)
    if params_dtype is not None:
        tgt_dt = jnp.dtype(params_dtype)
        variables = jax.tree.map(
            lambda a: np.asarray(a).astype(tgt_dt)
            if jnp.issubdtype(np.asarray(a).dtype, jnp.floating) else a,
            variables)

    kwargs = {} if apply_method is None else {"method": apply_method}
    if quantize == "int8":
        dq_dtype = jnp.dtype(params_dtype or "float32")
        variables = dict(variables,
                         params=quantize_params_int8(variables["params"]))
        fwd = jax.jit(
            lambda v, x: model.apply(
                dict(v, params=dequantize_params(v["params"], dq_dtype)),
                x, False, **kwargs))
    else:
        fwd = jax.jit(lambda v, x: model.apply(v, x, False, **kwargs))
    v_abs = _abstractify(variables)
    programs: Dict[str, bytes] = {}
    for b in sorted(set(int(b) for b in batch_sizes)):
        x_abs = jax.ShapeDtypeStruct((b,) + tuple(input_shape), np.float32)
        exp = jax_export.export(fwd, platforms=list(platforms))(v_abs, x_abs)
        programs[str(b)] = bytes(exp.serialize())

    bundle = {
        "version": ARTIFACT_VERSION,
        "num_classes": int(num_classes),
        "batch_sizes": [int(b) for b in sorted(set(batch_sizes))],
        "platforms": list(platforms),
        "model_cfg": dict(meta or {}),
        "quantize": quantize,
        "programs": programs,
        "params": variables,
    }
    return serialization.msgpack_serialize(_jsonify(bundle))


def _jsonify(tree):
    """msgpack chokes on dtypes/None inside the cfg dict — stringify them
    (inverted by :func:`_unjsonify` on load)."""
    if isinstance(tree, dict):
        return {k: _jsonify(v) for k, v in tree.items()}
    if tree is None:
        return "__none__"
    if isinstance(tree, type):  # e.g. jnp.float32 class objects in cfg
        return str(np.dtype(tree))
    return tree


def _unjsonify(tree):
    if isinstance(tree, dict):
        return {k: _unjsonify(v) for k, v in tree.items()}
    return None if tree == "__none__" else tree


def save_classifier(path: str, blob: bytes) -> str:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


class ExportedClassifier:
    """A loaded serving artifact: bucketed, padded, chunked inference.

    ``predict_logits`` returns ``[n, num_classes]`` f32; ``predict`` returns
    1-based labels with the background logit excluded at argmax — the
    reference's eval rule (`Model_Finetuning.py:277-280`).
    """

    def __init__(self, bundle: dict):
        self.version = int(bundle["version"])
        self.num_classes = int(bundle["num_classes"])
        self.batch_sizes = sorted(int(b) for b in bundle["batch_sizes"])
        self.model_meta = _unjsonify(bundle["model_cfg"])  # '__none__'->None;
        # dtype fields are dtype-name strings (e.g. 'bfloat16') for jnp.dtype
        self.quantize = _unjsonify(bundle.get("quantize", "__none__"))
        self.params = bundle["params"]
        self._calls = {
            int(b): jax_export.deserialize(bytearray(blob)).call
            for b, blob in bundle["programs"].items()
        }

    def _bucket(self, n: int) -> int:
        for b in self.batch_sizes:
            if b >= n:
                return b
        return self.batch_sizes[-1]

    def predict_logits(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float32)
        n = x.shape[0]
        if n == 0:
            return np.zeros((0, self.num_classes), np.float32)
        max_b = self.batch_sizes[-1]
        out = []
        for s in range(0, n, max_b):
            chunk = x[s:s + max_b]
            b = self._bucket(chunk.shape[0])
            if chunk.shape[0] < b:
                chunk = np.concatenate(
                    [chunk, np.zeros((b - chunk.shape[0],) + chunk.shape[1:],
                                     np.float32)])
            logits = np.asarray(self._calls[b](self.params, chunk))
            out.append(logits[:min(max_b, n - s)])
        return np.concatenate(out)

    def predict(self, x: np.ndarray) -> np.ndarray:
        logits = self.predict_logits(x)
        return np.argmax(logits[:, 1:], axis=1).astype(np.int32) + 1


def load_classifier(path_or_blob) -> ExportedClassifier:
    if isinstance(path_or_blob, (bytes, bytearray)):
        blob = bytes(path_or_blob)
    else:
        with open(path_or_blob, "rb") as f:
            blob = f.read()
    bundle = serialization.msgpack_restore(blob)
    if int(bundle["version"]) > ARTIFACT_VERSION:
        raise ValueError(
            f"artifact version {bundle['version']} is newer than this "
            f"library supports ({ARTIFACT_VERSION})")
    return ExportedClassifier(bundle)
