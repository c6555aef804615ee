"""Optimizer and LR schedules, matching the reference's training semantics.

The reference uses torch ``AdamW`` with two parameter groups — weight decay
``wd`` for everything except parameters whose *name* contains ``bias`` or
``norm`` (`/root/reference/Model_Pretraining.py:79-85`,
`/root/reference/Model_Finetuning.py:99-104`) — and timm's
``CosineLRScheduler``:

* pretraining: per-iteration schedule, ``t_initial = epochs * steps``,
  ``lr_min = 1e-6``, ``warmup_t = ceil(0.05 * iters)``, ``warmup_lr_init = 0``
  (timm default), betas (0.9, 0.95) (`Model_Pretraining.py:86-88`).
* fine-tuning: per-epoch schedule, ``t_initial = epochs``,
  ``lr_min = warmup_lr_init = lr * 0.01``, ``warmup_t = ceil(0.1 * epochs)``,
  torch-default betas (0.9, 0.999) (`Model_Finetuning.py:105-107`).

timm's cosine (cycle 0, no decay/k-decay options used):
``lr(t) = warmup_lr_init + t * (lr - warmup_lr_init) / warmup_t`` for
``t < warmup_t``; else
``lr(t) = lr_min + 0.5 * (lr - lr_min) * (1 + cos(pi * t / t_initial))``.
(The cosine phase uses the *global* t, not t - warmup_t.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def timm_cosine_schedule(
    base_lr: float,
    t_initial: int,
    warmup_t: int = 0,
    lr_min: float = 0.0,
    warmup_lr_init: float = 0.0,
) -> optax.Schedule:
    """timm ``CosineLRScheduler`` (single cycle), as a pure function of step."""

    def schedule(t):
        t = jnp.asarray(t, jnp.float32)
        warm = warmup_lr_init + t * (
            (base_lr - warmup_lr_init) / max(warmup_t, 1)
        )
        cos = lr_min + 0.5 * (base_lr - lr_min) * (
            1.0 + jnp.cos(jnp.pi * t / max(t_initial, 1))
        )
        if warmup_t <= 0:
            return cos
        return jnp.where(t < warmup_t, warm, cos)

    return schedule


def wd_mask(params) -> dict:
    """True for leaves that receive weight decay.

    The reference's rule is by *name substring*: any parameter whose dotted
    name contains ``bias`` or ``norm`` is exempt
    (`Model_Pretraining.py:79-84`). In the flax tree that exempts every Dense
    bias and both LayerNorm scale and bias (module names norm/norm1/norm2/
    decoder_norm contain "norm").
    """

    def decays(path) -> bool:
        parts = [k.key if hasattr(k, "key") else str(k) for k in path]
        name = ".".join(str(p) for p in parts).lower()
        return not ("bias" in name or "norm" in name)

    return jax.tree_util.tree_map_with_path(lambda p, _: decays(p), params)


def adamw(
    schedule: optax.Schedule,
    weight_decay: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    params_example=None,
    grad_clip: Optional[float] = None,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """AdamW with the reference's decay mask. ``params_example`` is only used
    to build the mask shape; optax masks take a callable so it stays lazy.

    ``mu_dtype`` (e.g. ``jnp.bfloat16``) stores the FIRST moment in reduced
    precision — an HBM byte cut for bandwidth-bound steps. The second moment
    stays f32 (its dynamic range drives the update denominator; optax exposes
    no nu_dtype, deliberately)."""
    txs = []
    if grad_clip is not None:
        txs.append(optax.clip_by_global_norm(grad_clip))
    txs.append(
        optax.adamw(
            learning_rate=schedule,
            b1=b1,
            b2=b2,
            eps=eps,
            mu_dtype=mu_dtype,
            weight_decay=weight_decay,
            mask=wd_mask,
        )
    )
    return optax.chain(*txs)


def pretrain_optimizer(
    lr: float,
    weight_decay: float,
    total_steps: int,
    warmup_frac: float = 0.05,
    lr_min: float = 1e-6,
    b1: float = 0.9,
    b2: float = 0.95,
    mu_dtype=None,
):
    """Per-iteration cosine with 5% warmup (`Model_Pretraining.py:86-88`).

    timm's scheduler is stepped AFTER ``optimizer.step()``
    (`Model_Pretraining.py:100-105`) and the constructor initializes lr to
    ``warmup_lr_init``, so reference iteration t trains at cosine(t-1) with
    iteration 0 at warmup_lr_init == cosine(0). The returned schedule is
    shifted accordingly: sched(t) = cosine(max(t-1, 0)).
    """
    inner = timm_cosine_schedule(
        lr,
        t_initial=total_steps,
        warmup_t=int(np.ceil(total_steps * warmup_frac)),
        lr_min=lr_min,
        warmup_lr_init=0.0,
    )

    def sched(t):
        return inner(jnp.maximum(jnp.asarray(t) - 1, 0))

    return adamw(sched, weight_decay, b1=b1, b2=b2, mu_dtype=mu_dtype), sched


def finetune_optimizer(
    lr: float,
    weight_decay: float,
    epochs: int,
    steps_per_epoch: int,
    warmup_frac: float = 0.1,
    encoder_lr_scale: float = 1.0,
):
    """Per-EPOCH cosine with 10% warmup and floor/init at lr*0.01
    (`Model_Finetuning.py:105-107`). The schedule is indexed by the global
    step and divides by steps_per_epoch so the LR changes once per epoch.

    The reference calls ``scheduler.step(epoch)`` AFTER epoch e
    (`Model_Finetuning.py:234`), so epoch e trains at cosine(e-1) and epoch 0
    at the constructor-initialized warmup_lr_init == cosine(0); the epoch
    index is shifted accordingly.

    ``encoder_lr_scale`` multiplies the learning rate of every parameter
    OUTSIDE the classification head (``cls_head``): 1.0 reproduces the
    reference's uniform-lr AdamW exactly (`Model_Finetuning.py:99-104` has
    no per-layer lr); 0.0 freezes the pretrained encoder (linear-probe-style
    head training); small values (0.01-0.1) are MAE-finetuning practice.
    This knob exists because measurement showed the uniform-lr recipe
    DAMAGES the pretrained representation at tiny label budgets: on the
    textured benchmark a frozen-encoder linear probe reaches 89.7 OA where
    the reference recipe lands at 77.9 (scripts/diag_class6_probe.py).
    """
    epoch_sched = timm_cosine_schedule(
        lr,
        t_initial=epochs,
        warmup_t=int(np.ceil(warmup_frac * epochs)),
        lr_min=lr * 0.01,
        warmup_lr_init=lr * 0.01,
    )

    def sched(step):
        e = jnp.asarray(step) // max(steps_per_epoch, 1)
        return epoch_sched(jnp.maximum(e - 1, 0))

    if encoder_lr_scale == 1.0:
        return adamw(sched, weight_decay, b1=0.9, b2=0.999), sched

    def enc_sched(step):
        return sched(step) * encoder_lr_scale

    def partition(params):
        def label(path, _):
            first = path[0]
            name = first.key if hasattr(first, "key") else str(first)
            return "head" if str(name) == "cls_head" else "encoder"

        return jax.tree_util.tree_map_with_path(label, params)

    tx = optax.multi_transform(
        {"head": adamw(sched, weight_decay, b1=0.9, b2=0.999),
         "encoder": adamw(enc_sched, weight_decay, b1=0.9, b2=0.999)},
        partition,
    )
    return tx, sched
