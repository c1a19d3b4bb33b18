"""Pruning over parameter pytrees.

Parity with Classification/pruner/ (utils.py:23-325, omp.py, synflow.py):
global unstructured L1 / random pruning of all conv kernels, custom-mask
application, mask extraction/reversal, sparsity checks, and the SNIP /
GraSP / SynFlow importance scores.

Design: a *prune mask* is a 0/1 pytree with the same structure as the
params; non-conv leaves are all-ones (only conv kernels are pruned, like
the reference which prunes nn.Conv2d weights only). The torch version
re-parameterizes modules with forward hooks (weight = weight_orig · mask);
here the mask is explicit state and the effective params are
``apply_prune_mask(params, mask)`` — one fused tree_map, jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from salun.dist.topk import global_topk_masks


def is_conv_kernel(x) -> bool:
    return hasattr(x, "ndim") and x.ndim == 4


def ones_mask(params):
    return jax.tree.map(lambda p: jnp.ones_like(p, jnp.float32), params)


def apply_prune_mask(params, mask):
    """Effective (pruned) parameters."""
    if mask is None:
        return params
    return jax.tree.map(lambda p, m: p * m.astype(p.dtype), params, mask)


def _prune_conv_by_scores(params, scores_fn, px: float):
    """Shared core: build per-conv-leaf scores, keep global top (1-px)."""
    leaves, treedef = jax.tree.flatten(params)
    conv_positions = [i for i, l in enumerate(leaves) if is_conv_kernel(l)]
    scores = [scores_fn(i, leaves[i]) for i in conv_positions]
    n = sum(int(s.size) for s in scores)
    keep = n - int(px * n)
    keep_masks = global_topk_masks(scores, keep)
    out = [jnp.ones_like(l, jnp.float32) for l in leaves]
    for pos, m in zip(conv_positions, keep_masks):
        out[pos] = m
    return jax.tree.unflatten(treedef, out)


def global_l1_prune(params, px: float, mask=None):
    """Prune the px fraction of conv-kernel weights with smallest |w·m|
    globally (pruner/utils.py:23-35 pruning_model). Previously-pruned
    weights are zero in w·m and therefore stay pruned, matching torch's
    repeated global_unstructured semantics."""
    eff = apply_prune_mask(params, mask)
    eff_leaves = jax.tree.leaves(eff)
    return _prune_conv_by_scores(
        params, lambda i, l: jnp.abs(eff_leaves[i].astype(jnp.float32)), px
    )


def global_random_prune(params, px: float, key, mask=None):
    """Random global pruning (pruner/utils.py:67-79), composing with an
    existing mask (already-pruned weights score below everything)."""
    leaves = jax.tree.leaves(params)
    keys = jax.random.split(key, len(leaves))
    mask_leaves = jax.tree.leaves(mask) if mask is not None else None

    def score(i, l):
        s = jax.random.uniform(keys[i], l.shape, jnp.float32)
        if mask_leaves is not None:
            s = jnp.where(mask_leaves[i] > 0, s, -1.0)
        return s

    return _prune_conv_by_scores(params, score, px)


def check_sparsity(params, mask) -> float:
    """Remaining-weight % over conv kernels (utils.py check_sparsity)."""
    if mask is None:
        return 100.0
    kept = total = 0.0
    for p, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask)):
        if is_conv_kernel(p):
            kept += float(jnp.sum(m))
            total += p.size
    return 100.0 * kept / max(total, 1.0)


def extract_mask(mask):
    """{path: conv mask} view (parity: pruner extract_mask of *_mask keys)."""
    from salun.utils.tree import flatten_names

    return {k: v for k, v in flatten_names(mask).items() if v.ndim == 4}


def reverse_mask(mask):
    return jax.tree.map(
        lambda m: 1.0 - m if is_conv_kernel(m) else m, mask
    )


# ---------------------------------------------------------------- scores
# Importance scores for one-shot pruning (pruner/snip-grasp-synflow family).


def snip_scores(loss_grad_fn, params, batch):
    """SNIP: |g ⊙ w|."""
    g = loss_grad_fn(params, batch)
    return jax.tree.map(lambda p, gg: jnp.abs(p * gg), params, g)


def grasp_scores(loss_grad_fn, params, batch, eps: float = 1e-3):
    """GraSP: -w ⊙ (H·g), H·g approximated by finite differences."""
    g = loss_grad_fn(params, batch)
    moved = jax.tree.map(lambda p, gg: p + eps * gg, params, g)
    g2 = loss_grad_fn(moved, batch)
    hg = jax.tree.map(lambda a, b: (b - a) / eps, g, g2)
    return jax.tree.map(lambda p, h: -(p * h), params, hg)


def synflow_scores(model, params, input_shape):
    """SynFlow: |∂R/∂w ⊙ w| with R = sum(model_|w|(ones))."""
    abs_params = jax.tree.map(jnp.abs, params)

    def objective(p):
        ones = jnp.ones(input_shape, jnp.float32)
        out = model.apply({"params": p}, ones, train=False)
        return jnp.sum(out)

    g = jax.grad(objective)(abs_params)
    return jax.tree.map(lambda p, gg: jnp.abs(p * gg), params, g)


def prune_by_scores(params, scores, px: float):
    """Keep the global top (1-px) of conv kernels by the given scores."""
    score_leaves = jax.tree.leaves(scores)
    return _prune_conv_by_scores(
        params, lambda i, l: score_leaves[i].astype(jnp.float32), px
    )
