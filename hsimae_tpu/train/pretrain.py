"""MAE pretraining: jitted+sharded train step and the epoch loop.

TPU-native counterpart of ``mask_pretraining``
(`/root/reference/Model_Pretraining.py:57-113`):

* scenes stay resident in HBM; each step gathers its 9x9 patch batch on
  device from an int32 cut-index slice (no host-side patch materialization,
  no per-step H2D image copy),
* flip augmentation runs on device from PRNG keys,
* the kept-grid shape ``(len_t, len_l)`` is sampled on host per batch and is
  a static jit argument — a handful of specializations instead of dynamic
  shapes (`SURVEY.md` §7 hard-parts),
* the step rng derives from (seed, global step), so resume is bit-exact
  without serializing PRNG state,
* data parallelism: batch sharded over the mesh 'data' axis, params
  replicated; XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

import random as _pyrandom
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from hsimae_tpu.config import ModelConfig, PretrainConfig
from hsimae_tpu.checkpoints.io import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    save_params,
)
from hsimae_tpu.data.pipeline import (
    MultiScenePatchSource,
    augment_flips,
    batch_indices,
    gather_multiscene,
)
from hsimae_tpu.models.hsimae import HSIMAE, build_hsimae, init_model
from hsimae_tpu.models.masking import choose_grid_shape, group_by_shape
from hsimae_tpu.parallel.mesh import (
    make_mesh,
    pad_to_multiple,
    process_local_slice,
    replicate,
    shard_batch,
)
from hsimae_tpu.train.optim import pretrain_optimizer
from hsimae_tpu.utils.logger import MetricLogger


class TrainState(train_state.TrainState):
    pass


def make_pretrain_step(model: HSIMAE, flip_augment: bool = True):
    """Returns ``step(state, imgs, rng, len_t, len_l, w=None) -> (state, loss)``.

    ``rng`` is a per-step PRNGKey; ``len_t``/``len_l`` are static. ``w`` is an
    optional per-sample validity weight: the final partial batch of an epoch
    is padded to the static shape with wrapped duplicates, and weighting them
    0 matches the reference's smaller-final-batch semantics (its DataLoader
    trains each cut exactly once per epoch).
    """

    def step(state: TrainState, imgs: jax.Array, rng: jax.Array, len_t: int,
             len_l: int, w=None):
        kf, km, kd = jax.random.split(rng, 3)
        if flip_augment:
            imgs = augment_flips(imgs, kf)

        def loss_fn(params):
            loss, _, _, _ = model.apply(
                {"params": params},
                imgs,
                len_t,
                len_l,
                True,
                w,
                rngs={"mask": km, "droppath": kd},
                method=HSIMAE.forward_pretrain,
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return jax.jit(step, static_argnums=(3, 4), donate_argnums=(0,))


def make_fused_pretrain_chunk(
    model: HSIMAE,
    source: MultiScenePatchSource,
    flip_augment: bool = True,
    mesh=None,
):
    """One dispatch = ``lax.scan`` over K full training steps, with the patch
    gather, per-scene normalization, and flip augmentation INSIDE the scan —
    the host only ships a ``[K, B, 3]`` int32 index block per call and syncs
    once on the chunk-mean loss. This removes the per-step dispatch +
    host-gather overhead that dominates the tiny-model step time.

    Returns ``chunk(state, locs_chunk, base_rng, len_t, len_l) ->
    (state, mean_loss)`` with static ``len_t``/``len_l``.

    Deliberate divergence: the epoch is padded (wrapping) to whole [K, B]
    chunks, so up to K*B-1 duplicated cuts train at FULL weight each epoch —
    the throughput-optimal trade (vs the non-fused path, which zero-weights
    its padded tail). On the 4M-patch corpus the duplication is <0.1%.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    flat, widths, bases = source._flat, source._widths, source._bases
    mins, maxs = source._min, source._max
    ps = source.patch_size
    # chunk layout is [K_steps, batch, ...]: batch is dim 1
    dp_sh = NamedSharding(mesh, P(None, "data")) if mesh is not None else None

    # ``flat`` (the concatenated scene buffer) is a jit ARGUMENT, not a
    # closure capture: captured device arrays are embedded in the lowered
    # program as constants, which at HSIHybrid scale (~5 GB of scenes) ships
    # gigabytes into the remote compile and duplicates the buffer in the
    # executable (see MultiScenePatchSource.gather for the same rule).
    def chunk_impl(state: TrainState, locs_chunk: jax.Array,
                   base_rng: jax.Array, flat: jax.Array, len_t: int,
                   len_l: int):
        # ONE bulk gather for the whole chunk before the scan: gathers inside
        # a lax.scan body execute catastrophically slowly on this backend
        # (~300ms/step vs 1.2ms standalone — measured), while a single big
        # flat-index gather runs at memory speed.
        k_steps, bsz = locs_chunk.shape[0], locs_chunk.shape[1]
        imgs_all = gather_multiscene(
            flat, widths, bases, mins, maxs,
            locs_chunk.reshape(k_steps * bsz, 3), ps,
        ).reshape(k_steps, bsz, ps, ps, flat.shape[-1])
        if dp_sh is not None:
            imgs_all = jax.lax.with_sharding_constraint(imgs_all, dp_sh)

        def body(state, xs):
            imgs, i = xs
            kf, km, kd = jax.random.split(jax.random.fold_in(base_rng, i), 3)
            if flip_augment:
                imgs = augment_flips(imgs, kf)

            def loss_fn(params):
                loss, _, _, _ = model.apply(
                    {"params": params}, imgs, len_t, len_l, True,
                    rngs={"mask": km, "droppath": kd},
                    method=HSIMAE.forward_pretrain,
                )
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads=grads), loss

        state, losses = jax.lax.scan(
            body, state, (imgs_all, jnp.arange(k_steps, dtype=jnp.int32))
        )
        return state, losses.mean()

    jitted = jax.jit(chunk_impl, static_argnums=(4, 5), donate_argnums=(0,))

    def chunk(state: TrainState, locs_chunk: jax.Array, base_rng: jax.Array,
              len_t: int, len_l: int):
        return jitted(state, locs_chunk, base_rng, flat, len_t, len_l)

    return chunk


def _orbax_has_checkpoints(workdir: str) -> Optional[str]:
    """Cheap filesystem check (no orbax import): does ``workdir`` contain
    orbax CheckpointManager step directories? Returns a description or None.
    Used to catch a --ckpt-backend flip between write and resume."""
    import os

    try:
        steps = [d for d in os.listdir(workdir)
                 if d.isdigit() and os.path.isdir(os.path.join(workdir, d))]
    except OSError:
        return None
    return f"orbax steps {sorted(int(s) for s in steps)}" if steps else None


def run_pretraining(
    source: MultiScenePatchSource,
    locs: np.ndarray,
    model_cfg: ModelConfig,
    cfg: PretrainConfig,
    workdir: Optional[str] = None,
    mesh=None,
    resume: bool = True,
    logger: Optional[MetricLogger] = None,
    profile_dir: Optional[str] = None,
    stop_after_epochs: Optional[int] = None,
):
    """Epoch loop over the cut index. Returns (params, history dict)."""
    model = build_hsimae(model_cfg)
    variables = init_model(model, seed=cfg.seed)
    params = variables["params"]

    if mesh is None and len(jax.devices()) > 1:
        mesh = make_mesh()
    dsize = int(mesh.shape["data"]) if mesh is not None else 1
    bs = pad_to_multiple(min(cfg.batch_size, len(locs)), dsize)

    n = len(locs)
    steps_per_epoch = int(np.ceil(n / bs))
    if cfg.fused_steps > 0:
        # the fused path pads each epoch (wrapping) to whole [K, B] chunks,
        # so the schedule and resume math must count the padded steps
        k = min(cfg.fused_steps, steps_per_epoch)
        steps_per_epoch = int(np.ceil(steps_per_epoch / k)) * k
    total_steps = steps_per_epoch * cfg.epochs
    tx, sched = pretrain_optimizer(
        cfg.lr, cfg.weight_decay, total_steps,
        warmup_frac=cfg.warmup_frac, lr_min=cfg.lr_min,
        b1=cfg.adam_b1, b2=cfg.adam_b2,
        mu_dtype=jnp.dtype(cfg.adam_mu_dtype) if cfg.adam_mu_dtype else None,
    )
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    if mesh is not None:
        state = replicate(state, mesh)

    use_orbax = workdir is not None and cfg.checkpoint_backend == "orbax"
    ckptr = None
    if use_orbax:
        from hsimae_tpu.checkpoints.orbax_io import OrbaxCheckpointer

        ckptr = OrbaxCheckpointer(workdir, max_to_keep=cfg.ckpt_max_to_keep)

    start_epoch = 0
    restored_any = False
    if resume and workdir:
        if use_orbax:
            restored = ckptr.restore_latest(state)
            if restored is not None:
                state = restored
                restored_any = True
                start_epoch = int(state.step) // steps_per_epoch
                print(f"[pretrain] resumed from orbax step "
                      f"{ckptr.latest_step()} at epoch {start_epoch}")
        else:
            ck = latest_checkpoint(workdir)
            if ck:
                state = restore_checkpoint(ck, state)
                restored_any = True
                start_epoch = int(state.step) // steps_per_epoch
                print(f"[pretrain] resumed from {ck} at epoch {start_epoch}")
        if not restored_any:
            # resume requested but the selected backend found nothing: if the
            # OTHER backend's checkpoints exist in workdir, the user almost
            # certainly flipped --ckpt-backend mid-run — restarting at epoch 0
            # would silently overwrite params_final.msgpack and lose the run
            other = (latest_checkpoint(workdir) if use_orbax
                     else _orbax_has_checkpoints(workdir))
            if other:
                raise RuntimeError(
                    f"resume requested with --ckpt-backend "
                    f"{cfg.checkpoint_backend!r}, which found no checkpoint "
                    f"in {workdir}, but the other backend's checkpoints "
                    f"exist there ({other}); re-run with the backend the "
                    f"workdir was written with, or pass resume=False / a "
                    f"fresh workdir to deliberately start over")

    multihost = jax.process_count() > 1 and mesh is not None
    base_key = jax.random.PRNGKey(cfg.seed)
    logger = logger or MetricLogger(workdir)
    epoch_losses = []
    t_size, l_size = model_cfg.t_size, model_cfg.l_size

    fused = cfg.fused_steps > 0
    if fused:
        chunk_fn = make_fused_pretrain_chunk(model, source, mesh=mesh)
    else:
        step_fn = make_pretrain_step(model)

    end_epoch = cfg.epochs
    if stop_after_epochs is not None:  # simulate preemption after N epochs
        end_epoch = min(end_epoch, start_epoch + stop_after_epochs)

    # wait()/close() must run on EVERY exit path: an exception mid-
    # training (OOM, data error) must not leak the orbax background
    # save thread or leave the last enqueued async save uncommitted
    try:
        for epoch in range(start_epoch, end_epoch):
            # profile the SECOND epoch: the first contains the compiles
            # (the reference has no tracing at all; SURVEY.md §5)
            if profile_dir and epoch == start_epoch + 1:
                jax.profiler.start_trace(profile_dir)
            # per-epoch reseeded shuffle, the reference's `stable(loader, 42+epoch)`
            ep_rng = np.random.default_rng(cfg.seed + epoch)
            shape_rng = _pyrandom.Random(cfg.seed * 1000 + epoch)
            ep_loss, ep_steps = 0.0, 0
            step_losses = []  # device arrays; summed in ONE sync at epoch end
            t0 = time.perf_counter()
            if fused:
                # pad the shuffled epoch (wrapping) to whole [K, B] chunks
                k = min(cfg.fused_steps, int(np.ceil(n / bs)))
                order = ep_rng.permutation(n)
                n_chunks = steps_per_epoch // k
                order = np.resize(order, n_chunks * k * bs)
                for ci in range(n_chunks):
                    sel = order[ci * k * bs : (ci + 1) * k * bs].reshape(k, bs)
                    locs_chunk = jnp.asarray(locs[sel])
                    len_t, len_l = choose_grid_shape(t_size, l_size, cfg.mask_ratio, shape_rng)
                    rng = jax.random.fold_in(base_key, int(state.step))
                    state, loss = chunk_fn(state, locs_chunk, rng, len_t, len_l)
                    ep_steps += k
                    ep_loss += float(loss) * k  # one device sync per chunk
                    if (ci + 1) * k % cfg.log_every < k:
                        logger.log(step=int(state.step), loss=float(loss),
                                   lr=float(sched(int(state.step) - 1)))
            else:
                batches = list(batch_indices(n, bs, rng=ep_rng))
                by_shape = group_by_shape(batches, t_size, l_size,
                                          cfg.mask_ratio, shape_rng)
                for (len_t, len_l), group in by_shape.items():
                    for chunk, valid in group:
                        # padded tail rows (wrapped duplicates) get weight 0 so
                        # each cut contributes exactly once per epoch, like the
                        # reference DataLoader's smaller final batch. Pass w only
                        # when padding exists: the common all-valid batch keeps
                        # the weightless (slightly cheaper) program.
                        w = None if valid.all() else jnp.asarray(valid, jnp.float32)
                        # multi-host: every process computes the same seeded
                        # permutation; each gathers only its contiguous slice of
                        # the global batch and shard_batch assembles the global
                        # array from the per-process shards
                        if multihost:
                            sl = process_local_slice(bs)
                            imgs = shard_batch(source.gather(locs[chunk[sl]]), mesh)
                            if w is not None:
                                w = shard_batch(w[sl], mesh, multihost=True)
                        else:
                            imgs = source.gather(locs[chunk])
                            if mesh is not None:
                                imgs = shard_batch(imgs, mesh)
                                if w is not None:
                                    w = shard_batch(w, mesh)
                        rng = jax.random.fold_in(base_key, int(state.step))
                        state, loss = step_fn(state, imgs, rng, len_t, len_l, w)
                        ep_steps += 1
                        # no per-step float(loss): the reference's per-step
                        # .item() host sync (`Model_Pretraining.py:106`) is the
                        # exact host-bound pattern SURVEY flags; losses stay on
                        # device and sync once per log interval / epoch end
                        step_losses.append(loss)
                        if ep_steps % cfg.log_every == 0:
                            logger.log(step=int(state.step), loss=float(loss),
                                       lr=float(sched(int(state.step) - 1)))
            if step_losses:  # non-fused path: single host sync for the epoch
                ep_loss = float(jnp.stack(step_losses).sum())
            dt = time.perf_counter() - t0
            if profile_dir and epoch == start_epoch + 1:
                jax.profiler.stop_trace()
            mean_loss = ep_loss / max(ep_steps, 1)
            epoch_losses.append(mean_loss)
            pps = ep_steps * bs / dt
            logger.log(epoch=epoch, epoch_loss=mean_loss, patches_per_sec=pps)
            print(f"[pretrain] epoch {epoch}: loss {mean_loss:.4f}  {pps:,.0f} patches/s")
            if workdir and cfg.checkpoint_every_steps and (
                (epoch + 1) * steps_per_epoch % cfg.checkpoint_every_steps < steps_per_epoch
            ):
                if use_orbax:
                    ckptr.save(int(state.step), state)  # async: returns at once
                else:
                    save_checkpoint(workdir, int(state.step), state)
    finally:
        if ckptr is not None:
            ckptr.wait()  # async saves must be durable before returning
            ckptr.close()
    params = jax.device_get(state.params)
    if workdir:
        save_params(f"{workdir}/params_final.msgpack", params)
        np.save(f"{workdir}/train_log.npy",
                np.array([epoch_losses, []], dtype=object))
    return params, {"epoch_loss": epoch_losses}
