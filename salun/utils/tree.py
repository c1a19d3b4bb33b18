"""Pytree helpers shared across the framework.

The reference manipulates parameters as ``{name: tensor}`` dicts walked in
Python per step (e.g. Classification/unlearn/RL.py:11-34). Here everything is
a pytree and the per-parameter work is a single fused ``jax.tree.map`` inside
jit, so masks/θ₀-pinning cost one elementwise kernel instead of a Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import traverse_util


def flatten_names(tree) -> dict:
    """Flatten a nested param dict to {'a/b/c': leaf} (stable name keys).

    These names are the cross-format identity used by masks and checkpoint
    importers (reference saves masks as {torch_param_name: tensor},
    Classification/generate_mask.py:82).
    """
    flat = traverse_util.flatten_dict(tree, sep="/")
    return dict(flat)


def tree_from_flat(flat: dict):
    """Inverse of :func:`flatten_names`."""
    return traverse_util.unflatten_dict(flat, sep="/")


def tree_size(tree) -> int:
    """Total number of scalar elements in a pytree."""
    return sum(int(x.size) for x in jax.tree.leaves(tree))


def tree_zeros_like(tree):
    return jax.tree.map(jnp.zeros_like, tree)


def tree_cast(tree, dtype):
    return jax.tree.map(lambda x: x.astype(dtype), tree)


def tree_norm(tree) -> jnp.ndarray:
    """Global L2 norm over all leaves."""
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree.leaves(tree))
    )


def tree_l1(tree) -> jnp.ndarray:
    """Global L1 norm over all leaves (used by the *_l1 methods)."""
    return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(tree))
