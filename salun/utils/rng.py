"""Seeding helpers.

The reference seeds torch/numpy/random globally (Classification/utils.py:288-294).
JAX is functional: we derive explicit PRNG keys instead, and expose a single
helper that also seeds numpy (used by host-side data shuffling) so runs are
reproducible end to end.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_all(seed: int) -> jax.Array:
    """Seed numpy + python RNGs and return a root JAX PRNG key."""
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.PRNGKey(seed)


def key_iter(key: jax.Array):
    """Infinite stream of fresh subkeys."""
    while True:
        key, sub = jax.random.split(key)
        yield sub
