"""Spatial-spectral grid masking.

The reference implements this with three argsorts and gathers over the full
token sequence (`/root/reference/Models.py:484-535`), but its *effect* —
verified empirically in SURVEY.md §2.1 — is exactly:

  pick ``len_t`` random spectral rows and ``len_l`` random spatial columns;
  keep their cross product, with kept ids emerging in row-major (t, l) order.

The TPU-native formulation exploits that directly:

* ``(len_t, len_l)`` is sampled on host per batch (tiny bounded set, so each
  pair is a cheap jit specialization; no dynamic shapes under jit),
* on device, kept rows/cols come from one ``top_k`` each, and the binary
  mask is built with a one-hot scatter — no full-sequence argsort, and since
  the kept set is a row-major grid, the separable-branch rearranges stay
  pure reshapes.
* the decoder needs no ``ids_restore`` gather at all: all mask tokens are
  identical (the reference's "mask token" is the mean of the encoded tokens,
  `Models.py:583-584`), so unshuffling collapses to a one-hot scatter-add.
"""

from __future__ import annotations

import random as _pyrandom
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def choose_grid_shape(
    t_size: int, l_size: int, mask_ratio: float, rng: Optional[_pyrandom.Random] = None
) -> Tuple[int, int]:
    """Sample the kept-grid shape ``(len_t, len_l)``.

    Candidates are all ``2 <= len_t <= T, 2 <= len_l <= L``; those minimizing
    ``|(1 - ratio) * T * L - len_t * len_l|`` tie-break uniformly at random
    (`/root/reference/Models.py:484-493`). Host-side; the result is a static
    argument of the jitted step.
    """
    rng = rng or _pyrandom
    target = (1.0 - mask_ratio) * t_size * l_size
    cands = [(t, l) for t in range(2, t_size + 1) for l in range(2, l_size + 1)]
    diffs = [abs(target - t * l) for t, l in cands]
    best = min(diffs)
    ties = [c for c, d in zip(cands, diffs) if d == best]
    return ties[rng.randrange(len(ties))]


def grid_shape_candidates(t_size: int, l_size: int, mask_ratio: float):
    """All (len_t, len_l) pairs `choose_grid_shape` can return — the full set
    of jit specializations a training run will compile."""
    target = (1.0 - mask_ratio) * t_size * l_size
    cands = [(t, l) for t in range(2, t_size + 1) for l in range(2, l_size + 1)]
    diffs = [abs(target - t * l) for t, l in cands]
    best = min(diffs)
    return [c for c, d in zip(cands, diffs) if d == best]


def group_by_shape(items, t_size: int, l_size: int, mask_ratio: float, rng):
    """Sample a kept-grid shape per item (reference semantics: one draw per
    batch, `Models.py:484-493`) and GROUP items by shape. Batches are iid, so
    running groups contiguously is statistically identical while avoiding the
    per-switch cost of alternating between compiled (len_t, len_l)
    specializations. Returns ``{(len_t, len_l): [items...]}``."""
    by = {}
    for it in items:
        s = choose_grid_shape(t_size, l_size, mask_ratio, rng)
        by.setdefault(s, []).append(it)
    return by


class GridMask(NamedTuple):
    ids_keep: jax.Array  # [N, len_t * len_l] int32, row-major over the kept grid
    mask: jax.Array  # [N, T * L] f32: 0 = keep, 1 = masked
    ids_t: jax.Array  # [N, len_t] kept spectral rows, ascending
    ids_l: jax.Array  # [N, len_l] kept spatial cols, ascending


def spatial_spectral_mask(
    key: jax.Array, n: int, t_size: int, l_size: int, len_t: int, len_l: int
) -> GridMask:
    """Sample a per-example kept grid; all shapes static under jit."""
    kt, kl = jax.random.split(key)

    def pick(k, size, count):
        noise = jax.random.uniform(k, (n, size))
        _, idx = jax.lax.top_k(-noise, count)  # `count` smallest = kept
        return jnp.sort(idx, axis=1).astype(jnp.int32)

    ids_t = pick(kt, t_size, len_t)
    ids_l = pick(kl, l_size, len_l)
    ids_keep = (ids_t[:, :, None] * l_size + ids_l[:, None, :]).reshape(n, -1)

    keep_oh = jax.nn.one_hot(ids_keep, t_size * l_size, dtype=jnp.float32)  # [N,K,TL]
    mask = 1.0 - keep_oh.sum(axis=1)
    return GridMask(ids_keep=ids_keep, mask=mask, ids_t=ids_t, ids_l=ids_l)


def gather_tokens(x: jax.Array, ids: jax.Array) -> jax.Array:
    """Gather tokens ``x [N, S, C]`` at per-example ids ``[N, K]`` -> [N, K, C]."""
    return jnp.take_along_axis(x, ids[..., None], axis=1)


def scatter_tokens(kept: jax.Array, ids_keep: jax.Array, seq_len: int, fill: jax.Array) -> jax.Array:
    """Place ``kept [N, K, C]`` at ``ids_keep`` in a length-``seq_len`` sequence,
    filling every other slot with ``fill [N, 1, C]``.

    One-hot matmul scatter — MXU-friendly, replaces the reference's
    concat + gather-by-ids_restore unshuffle (`Models.py:583-589`).
    """
    oh = jax.nn.one_hot(ids_keep, seq_len, dtype=kept.dtype)  # [N, K, S]
    return jnp.einsum("nks,nkc->nsc", oh, kept - fill) + fill
