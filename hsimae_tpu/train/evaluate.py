"""Full-scene per-pixel sliding-window classification + metrics + colormaps.

TPU-native counterpart of ``test_model``
(`/root/reference/Model_Finetuning.py:243-301`):

* an HSIViT (encoder + AGG head, no decoder) loads fine-tuned weights by key
  intersection,
* every pixel of the scene gets a patch centered on it (symmetric padding),
  gathered on device in large static batches instead of a host DataLoader,
* background is excluded at argmax over ``logits[:, 1:]`` then +1 (`:277-280`),
* OA / AA / kappa / per-class are computed on ``test_gt != 0`` pixels,
* classification maps (full + gt-masked) are rendered with the reference's
  20-color palette.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hsimae_tpu.config import EvalConfig, ModelConfig
from hsimae_tpu.checkpoints.io import partial_restore, uncovered_leaves
from hsimae_tpu.data.pipeline import ScenePatchSource, batch_indices
from hsimae_tpu.models.hsimae import CLS_HEAD_NAME, HSIMAE, build_hsi_vit, init_model
from hsimae_tpu.utils.colormap import label_to_colormap, save_colormap
from hsimae_tpu.utils.metrics import Metrics, classification_metrics


@dataclasses.dataclass
class SceneEvalResult:
    pred_map: np.ndarray  # [h, w] predicted labels (1-based; never 0,
    # background logit excluded at argmax per `Model_Finetuning.py:277-280`)
    metrics: Metrics


import functools


@functools.lru_cache(maxsize=32)
def _cached_classify(model, mesh=None):
    def fwd(p, x):
        logits = model.apply({"params": p}, x, False, method=HSIMAE.classify)
        # argmax ON DEVICE with the background logit excluded, +1
        # (`Model_Finetuning.py:277-280`): the scene loop fetches [B] int32
        # labels instead of [B, C] f32 logits — C*4 fewer bytes per batch
        # over the (slow) device->host link (ops/metrics_ops design note)
        return jnp.argmax(logits[:, 1:], axis=-1).astype(jnp.int32) + 1

    if mesh is None:
        return jax.jit(fwd)
    # data-parallel eval: batch split over 'data', params replicated; XLA
    # runs each shard's forward locally (no collectives needed for labels)
    from hsimae_tpu.parallel.mesh import batch_sharding, replicated

    return jax.jit(fwd, in_shardings=(replicated(mesh), batch_sharding(mesh)))


def classify_scene(
    scene: np.ndarray,
    params: dict,
    model_cfg: ModelConfig,
    num_classes: int,
    cfg: EvalConfig = EvalConfig(),
    mesh=None,
) -> np.ndarray:
    """Predict a label for every pixel -> [h, w] int32 (1-based).

    ``mesh`` (a ``jax.sharding.Mesh`` from ``parallel.make_mesh``) enables
    data-parallel inference: each batch is split over the mesh's 'data' axis
    (batch size rounded up to a multiple of it) and params are replicated —
    full-scene maps scale linearly with chip count. The patch gather runs on
    the default device and the batch is resharded onto the mesh (eval is
    forward-only and gather-light; the reshard rides ICI)."""
    model = build_hsi_vit(model_cfg, num_classes)
    tgt = init_model(model, seed=0)["params"]
    params, loaded, skipped = partial_restore(tgt, params, verbose=False)
    # A wrong --num-classes or mismatched checkpoint would silently leave
    # leaves (worst: cls_head) at random init and produce meaningless metrics.
    uncovered = uncovered_leaves(tgt, loaded)
    if any(p[0] == CLS_HEAD_NAME for p in uncovered):
        raise ValueError(
            f"checkpoint does not cover {CLS_HEAD_NAME} — wrong num_classes "
            f"or a pretrain-only checkpoint? (loaded {len(loaded)}, "
            f"ignored {len(skipped)} source leaves)"
        )
    if uncovered:
        import warnings

        warnings.warn(
            f"partial restore left {len(uncovered)} target leaves at random "
            f"init (ignored {len(skipped)} source leaves); evaluation "
            "metrics may be meaningless", stacklevel=2)
    fwd = _cached_classify(model, mesh)

    source = ScenePatchSource(scene, model_cfg.img_size)
    h, w = scene.shape[:2]
    n = h * w
    bs = min(cfg.batch_size, n)
    if mesh is not None:
        from hsimae_tpu.parallel.mesh import (
            batch_sharding,
            pad_to_multiple,
            replicate,
        )

        bs = pad_to_multiple(bs, mesh.shape["data"])
        params = replicate(params, mesh)
        batch_sh = batch_sharding(mesh)
    out = np.zeros(n, np.int32)
    for chunk, valid in batch_indices(n, bs, shuffle=False):
        imgs = source.gather_pixels(chunk)
        if mesh is not None:
            imgs = jax.device_put(imgs, batch_sh)
        pred = np.asarray(fwd(params, imgs))  # [B] int32 labels, 1-based
        out[chunk[valid]] = pred[valid]
    return out.reshape(h, w)


def classify_scene_artifact(
    scene: np.ndarray,
    classifier,
    cfg: EvalConfig = EvalConfig(),
) -> np.ndarray:
    """Per-pixel scene classification through a loaded serving artifact
    (:class:`hsimae_tpu.serving.ExportedClassifier`) — full-scene eval with
    no flax/model source at deploy time. The artifact's own bucketing pads
    each gathered batch; labels are 1-based with background excluded, the
    same rule as :func:`classify_scene`."""
    img_size = int(classifier.model_meta.get("img_size", 9))
    source = ScenePatchSource(scene, img_size)
    h, w = scene.shape[:2]
    n = h * w
    bs = min(cfg.batch_size, n)
    out = np.zeros(n, np.int32)
    for chunk, valid in batch_indices(n, bs, shuffle=False):
        imgs = np.asarray(source.gather_pixels(chunk))
        pred = classifier.predict(imgs)
        out[chunk[valid]] = pred[valid]
    return out.reshape(h, w)


def _finish_eval(pred_map, test_gt, cfg, save_dir, name) -> SceneEvalResult:
    m = classification_metrics(test_gt, pred_map)
    if save_dir and cfg.save_colormaps:
        os.makedirs(save_dir, exist_ok=True)
        save_colormap(os.path.join(save_dir, f"{name}_pred.png"), pred_map)
        masked = np.where(test_gt != 0, pred_map, 0)
        save_colormap(os.path.join(save_dir, f"{name}_pred_masked.png"), masked)
    return SceneEvalResult(pred_map=pred_map, metrics=m)


def evaluate_scene(
    scene: np.ndarray,
    test_gt: np.ndarray,
    params: dict,
    model_cfg: ModelConfig,
    num_classes: int,
    cfg: EvalConfig = EvalConfig(),
    save_dir: Optional[str] = None,
    name: str = "scene",
    mesh=None,
) -> SceneEvalResult:
    pred_map = classify_scene(scene, params, model_cfg, num_classes, cfg,
                              mesh=mesh)
    return _finish_eval(pred_map, test_gt, cfg, save_dir, name)


def evaluate_scene_artifact(
    scene: np.ndarray,
    test_gt: np.ndarray,
    classifier,
    cfg: EvalConfig = EvalConfig(),
    save_dir: Optional[str] = None,
    name: str = "scene",
) -> SceneEvalResult:
    pred_map = classify_scene_artifact(scene, classifier, cfg)
    return _finish_eval(pred_map, test_gt, cfg, save_dir, name)
