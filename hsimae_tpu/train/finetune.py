"""Dual-branch fine-tuning: supervised CE on few labeled patches + masked
reconstruction on unlabeled target-scene patches.

TPU-native counterpart of ``dual_branch_finetuning``
(`/root/reference/Model_Finetuning.py:66-240`). Semantics preserved:

* DualViT = pretrained HSIMAE encoder/decoder + AGG cls head, drop_path 0.2,
  pretrained weights loaded by key intersection (`:87-96`),
* labeled pool split 50/50 stratified into train/val (`:111`),
* unlabeled batch size = ceil(N_unlabeled / steps_per_epoch) / 2 (`:120`),
* per-step loss = lamda * rec + CE(ignore_index=0) (`:150-154`),
* per-EPOCH cosine schedule, 10% warmup, floor lr*0.01 (`:105-107`),
* per-epoch val OA/AA/kappa; selection scalar = mean(OA, AA, kappa).

TPU-first differences: patches are gathered on device from the resident
scene; labeled/unlabeled batches are padded to static shapes with weight
masks (padding contributes 0 to both losses); drop-path/mask rngs derive
from (seed, step).
"""

from __future__ import annotations

import dataclasses
import random as _pyrandom
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from hsimae_tpu.config import FinetuneConfig, ModelConfig
from hsimae_tpu.checkpoints.io import partial_restore, save_params
from hsimae_tpu.data.pipeline import ScenePatchSource, augment_flips, batch_indices
from hsimae_tpu.data.sampling import DualSceneSplit, train_val_split
from hsimae_tpu.models.hsimae import HSIMAE, build_dual_vit, init_model
from hsimae_tpu.models.masking import choose_grid_shape, group_by_shape
from hsimae_tpu.parallel.mesh import make_mesh, pad_to_multiple, replicate, shard_batch
from hsimae_tpu.train.optim import finetune_optimizer
from hsimae_tpu.utils.logger import MetricLogger
from hsimae_tpu.utils.metrics import Metrics, metrics_from_raw_confusion


class TrainState(train_state.TrainState):
    pass


def cross_entropy_ignore0(logits: jax.Array, labels: jax.Array,
                          weight: Optional[jax.Array] = None) -> jax.Array:
    """torch ``CrossEntropyLoss(reduction='mean', ignore_index=0)``:
    mean over samples whose label != 0 (`Model_Finetuning.py:109`)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    m = (labels != 0).astype(jnp.float32)
    if weight is not None:
        m = m * weight
    return -(ll * m).sum() / jnp.maximum(m.sum(), 1.0)


import functools


@functools.lru_cache(maxsize=32)
def _cached_dual_step(model: HSIMAE, lamda: float, flip_augment: bool):
    """flax modules are frozen dataclasses (hashable), so protocol loops that
    rebuild the same model config reuse one compiled step instead of paying
    the (very expensive on this backend) recompile per run."""
    return make_dual_step(model, lamda, flip_augment)


def make_dual_step(model: HSIMAE, lamda: float, flip_augment: bool = True):
    """``step(state, x, y, w, x_u, w_u, rng, len_t, len_l) ->
    (state, loss, loss_rec, logits)``; w/w_u are validity weights for padded
    rows."""

    def step(state, x, y, w, x_u, w_u, rng, len_t, len_l):
        kf, ku, km, kd = jax.random.split(rng, 4)
        if flip_augment:
            x = augment_flips(x, kf)
            x_u = augment_flips(x_u, ku)

        def loss_fn(params):
            # forward_dual appends ones for the unlabeled rows itself
            loss_rec, logits = model.apply(
                {"params": params},
                x, x_u, len_t, len_l, True, w,
                rngs={"mask": km, "droppath": kd},
                method=HSIMAE.forward_dual,
            )
            loss_cls = cross_entropy_ignore0(logits, y, w)
            return lamda * loss_rec + loss_cls, (loss_rec, logits)

        (loss, (loss_rec, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads=grads), loss, loss_rec, logits

    return jax.jit(step, static_argnums=(7, 8), donate_argnums=(0,))


@functools.lru_cache(maxsize=32)
def _cached_eval_metrics_step(model: HSIMAE, n_classes: int):
    return make_eval_metrics_step(model, n_classes)


@functools.lru_cache(maxsize=8)
def _cached_cm_op(n_classes: int):
    """Jitted weighted confusion update for the TRAIN loop's logits (the
    dual step already returns them; this adds one tiny [C, C] op per step
    so the epoch-end sync is a single matrix)."""
    from hsimae_tpu.ops.metrics_ops import confusion_matrix_op

    return jax.jit(lambda y, p, w: confusion_matrix_op(y, p, n_classes, w))


def make_eval_metrics_step(model: HSIMAE, n_classes: int):
    """``ev(params, x, y, w) -> (cm, ce_sum, ce_count)``: forward + argmax +
    confusion-matrix update + masked CE partial sums, all on device — the
    val loop syncs ONE [C, C] matrix and two scalars per eval pass instead of
    every logit batch (ops/metrics_ops; the reference ships all logits to
    sklearn per epoch, `/root/reference/Model_Finetuning.py:176-179`).
    ``w`` zero-weights padded rows."""
    from hsimae_tpu.ops.metrics_ops import confusion_matrix_op

    def ev(params, x, y, w):
        logits = model.apply({"params": params}, x, False,
                             method=HSIMAE.classify)
        pred = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix_op(y, pred, n_classes, weight=w)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, y[:, None].astype(jnp.int32),
                                 axis=-1)[:, 0]
        m = (y != 0).astype(jnp.float32) * w  # CE ignore_index=0
        return cm, -(ll * m).sum(), m.sum()

    return jax.jit(ev)


@dataclasses.dataclass
class FinetuneResult:
    params: dict
    val_metrics: Metrics
    history: dict
    model_cfg: ModelConfig
    num_classes: int


def dual_branch_finetune(
    split: DualSceneSplit,
    model_cfg: ModelConfig,
    cfg: FinetuneConfig,
    pretrained: Optional[dict] = None,
    workdir: Optional[str] = None,
    mesh=None,
    seed: Optional[int] = None,
    logger: Optional[MetricLogger] = None,
    eval_every: int = 1,
) -> FinetuneResult:
    seed = cfg.seed if seed is None else seed
    n_class = split.n_classes
    model = build_dual_vit(model_cfg, n_class, drop_path=cfg.drop_path)
    params = init_model(model, seed=seed)["params"]
    if pretrained is not None:
        # forward_dual in forward_dual's mask branch: concat dims match because
        # the unlabeled set has the same patch geometry
        if "params" in pretrained and isinstance(pretrained["params"], dict):
            pretrained = pretrained["params"]
        params, _, _ = partial_restore(params, pretrained)

    rng_np = np.random.default_rng(seed)
    tr_idx, tr_y, va_idx, va_y = train_val_split(
        split.labeled_index, split.labels, cfg.train_ratio, rng=rng_np
    )

    source = ScenePatchSource(split.scene, model_cfg.img_size)
    n_tr, n_un = len(tr_idx), len(split.unlabeled_starts)

    if mesh is None and len(jax.devices()) > 1:
        mesh = make_mesh()
    dsize = int(mesh.shape["data"]) if mesh is not None else 1
    bs_l = pad_to_multiple(min(cfg.batch_size, n_tr), dsize)
    # schedule & averaging must count the ACTUAL batches run (bs_l after
    # mesh padding), not the nominal cfg.batch_size
    steps_per_epoch = int(np.ceil(n_tr / bs_l))
    bs_u = pad_to_multiple(
        max(1, int(np.ceil(n_un / steps_per_epoch) / 2)), dsize)

    tx, sched = finetune_optimizer(
        cfg.lr, cfg.weight_decay, cfg.epochs, steps_per_epoch, cfg.warmup_frac,
        encoder_lr_scale=cfg.encoder_lr_scale,
    )
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    if mesh is not None:
        state = replicate(state, mesh)

    step_fn = _cached_dual_step(model, cfg.lamda, True)
    eval_fn = _cached_eval_metrics_step(model, n_class)
    cm_fn = _cached_cm_op(n_class)
    base_key = jax.random.PRNGKey(seed)
    logger = logger or MetricLogger(workdir)
    t_size, l_size = model_cfg.t_size, model_cfg.l_size

    hist = {"loss": [], "loss_rec": [], "train_aa": [], "val_loss": [],
            "val_oa": [], "val_aa": [], "val_kappa": [], "val_epoch": []}
    best = None

    for epoch in range(cfg.epochs):
        ep_rng = np.random.default_rng(seed + 1000 + epoch)
        shape_rng = _pyrandom.Random(seed * 131 + epoch)
        un_order = ep_rng.permutation(n_un)
        un_pos = 0
        # device-side accumulators: one host sync per EPOCH, not per step
        # (the reference's per-step .item() is its host-bound weakness,
        # `Model_Finetuning.py:163-179`; SURVEY §3.2). Train accuracy
        # accumulates as [C, C] confusion updates (ops/metrics_ops), so the
        # epoch-end sync is one matrix, not every step's predictions.
        step_losses, step_recs, step_cms = [], [], []
        batches = list(batch_indices(n_tr, bs_l, rng=ep_rng))
        by_shape = group_by_shape(batches, t_size, l_size,
                                  cfg.mask_ratio, shape_rng)
        for (len_t, len_l), group in by_shape.items():
          for chunk, valid in group:
            x = source.gather_pixels(tr_idx[chunk])
            y = jnp.asarray(tr_y[chunk] * valid, jnp.int32)  # padded rows -> 0 (ignored)
            w = jnp.asarray(valid, jnp.float32)
            # unlabeled batch, wrapping like a reshuffled torch DataLoader iter
            if un_pos + bs_u > n_un:
                un_order = ep_rng.permutation(n_un)
                un_pos = 0
            u_sel = un_order[un_pos : un_pos + bs_u]
            if len(u_sel) < bs_u:  # pool smaller than one batch: tile
                u_sel = np.resize(un_order, bs_u)
            un_pos += bs_u
            x_u = source.gather_windows(split.unlabeled_starts[u_sel])
            w_u = jnp.ones(bs_u, jnp.float32)
            if mesh is not None:
                x, x_u = shard_batch(x, mesh), shard_batch(x_u, mesh)
            rng = jax.random.fold_in(base_key, int(state.step))
            state, loss, loss_rec, logits = step_fn(
                state, x, y, w, x_u, w_u, rng, len_t, len_l
            )
            step_losses.append(loss)
            step_recs.append(loss_rec)
            step_cms.append(cm_fn(y, jnp.argmax(logits, axis=-1), w))

        # single epoch-end sync for losses + the summed train confusion
        ep_loss = float(jnp.stack(step_losses).sum())
        ep_rec = float(jnp.stack(step_recs).sum())
        tr_m = metrics_from_raw_confusion(np.asarray(jnp.stack(step_cms).sum(0)))
        hist["loss"].append(ep_loss / steps_per_epoch)
        hist["loss_rec"].append(ep_rec / steps_per_epoch)
        hist["train_aa"].append(tr_m.aa)

        if (epoch + 1) % eval_every == 0 or epoch == cfg.epochs - 1:
            v_cms, v_ces, v_cnts = [], [], []
            for chunk, valid in batch_indices(
                len(va_idx), min(cfg.val_batch_size, len(va_idx)),
                shuffle=False,
            ):
                xv = source.gather_pixels(va_idx[chunk])
                yv = jnp.asarray(va_y[chunk] * valid, jnp.int32)
                cm, ce, cnt = eval_fn(state.params, xv, yv,
                                      jnp.asarray(valid, jnp.float32))
                v_cms.append(cm)
                v_ces.append(ce)
                v_cnts.append(cnt)
            # ONE sync per eval pass: a [C, C] confusion matrix + the CE
            # partial sums (ops/metrics_ops) — never the logit batches.
            # val CE loss (ignore_index=0) is the reference's 4th curve
            # (`Model_Finetuning.py:207-209,223-233`)
            vm = metrics_from_raw_confusion(
                np.asarray(jnp.stack(v_cms).sum(0)))
            val_loss = float(jnp.stack(v_ces).sum()
                             / jnp.maximum(jnp.stack(v_cnts).sum(), 1.0))
            hist["val_loss"].append(val_loss)
            hist["val_oa"].append(vm.oa)
            hist["val_aa"].append(vm.aa)
            hist["val_kappa"].append(vm.kappa)
            hist["val_epoch"].append(epoch)
            best = vm
            logger.log(epoch=epoch, loss=hist["loss"][-1], val_loss=val_loss,
                       val_oa=vm.oa, val_aa=vm.aa, val_kappa=vm.kappa,
                       lr=float(sched(int(state.step) - 1)))

    params = jax.device_get(state.params)
    if workdir:
        save_params(f"{workdir}/finetuned.msgpack", params)
        # reference artifacts: loss history + twin-axis curve PNG
        # (`Model_Finetuning.py:236-239`)
        np.save(f"{workdir}/train_log.npy",
                np.array([hist["loss"], hist["val_oa"]], dtype=object))
        from hsimae_tpu.utils.logger import plot_history

        plot_history(f"{workdir}/finetune_curves.png", hist)
    return FinetuneResult(
        params=params, val_metrics=best, history=hist,
        model_cfg=model_cfg.replace(num_classes=n_class), num_classes=n_class,
    )
