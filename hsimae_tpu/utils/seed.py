"""Determinism utilities.

The reference seeds python/numpy/torch and forces deterministic cuDNN
(`/root/reference/Utils/Seed_Everything.py:7-19`). In JAX determinism is the
default: all randomness flows through explicit PRNG keys. What remains to seed
is (a) numpy, used by the host-side samplers, and (b) python's `random`.

:class:`PRNG` is a tiny splitting helper so training loops can consume keys
imperatively without threading state by hand.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed numpy + python RNGs and return a fresh JAX root key."""
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


class PRNG:
    """Imperative wrapper over a JAX PRNG key: every ``next()`` splits."""

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def __call__(self) -> jax.Array:
        return self.next()
