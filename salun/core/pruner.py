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


def _prune_conv_by_scores(params, scores_fn, px: float, mask=None,
                          n_remaining=None):
    """Shared core: prune the globally lowest-scored px fraction of the
    REMAINING (unpruned) conv-kernel weights; previously-pruned weights
    stay pruned and do not consume the prune budget.

    This is torch's iterative-prune convention exactly
    (``prune.global_unstructured`` on an already-pruned module: the
    PruningContainer interprets ``amount`` relative to the remaining
    entries and selects only among them — verified empirically and by
    the golden tests, tests/test_pruner_parity.py). The prune count is
    ``round(px · n_remaining)`` with Python's round-half-even, torch's
    ``prune._compute_nparams_toprune`` convention."""
    leaves, treedef = jax.tree.flatten(params)
    mask_leaves = jax.tree.leaves(mask) if mask is not None else None
    conv_positions = [i for i, l in enumerate(leaves) if is_conv_kernel(l)]
    scores = []
    for i in conv_positions:
        s = scores_fn(i, leaves[i]).astype(jnp.float32)
        if mask_leaves is not None:
            # pruned entries sort below everything and can't be re-kept
            s = jnp.where(mask_leaves[i] > 0, s, -jnp.inf)
        scores.append(s)
    if n_remaining is not None:
        n_rem = int(n_remaining)  # caller-threaded (e.g. synflow_prune)
    elif mask_leaves is None:
        n_rem = sum(int(leaves[i].size) for i in conv_positions)
    else:
        # one fused device reduction + one host fetch (not one per leaf)
        n_rem = int(sum(jnp.sum(mask_leaves[i] > 0)
                        for i in conv_positions))
    keep = n_rem - round(px * n_rem)
    keep_masks = global_topk_masks(scores, keep)
    out = [jnp.ones_like(l, jnp.float32) for l in leaves]
    for pos, m in zip(conv_positions, keep_masks):
        out[pos] = m
    return jax.tree.unflatten(treedef, out)


def global_l1_prune(params, px: float, mask=None):
    """Prune the px fraction of the REMAINING conv-kernel weights with
    smallest |w·m| globally (pruner/utils.py:23-35 pruning_model).
    Matches torch's repeated ``global_unstructured`` semantics: pruned
    weights stay pruned, and px is a fraction of what remains
    (tests/test_pruner_parity.py::test_repeated_l1_prune...)."""
    eff = apply_prune_mask(params, mask)
    eff_leaves = jax.tree.leaves(eff)
    return _prune_conv_by_scores(
        params, lambda i, l: jnp.abs(eff_leaves[i].astype(jnp.float32)),
        px, mask,
    )


def global_random_prune(params, px: float, key, mask=None):
    """Random global pruning (pruner/utils.py:67-79), composing with an
    existing mask (px of the remaining; pruned stay pruned)."""
    leaves = jax.tree.leaves(params)
    keys = jax.random.split(key, len(leaves))

    def score(i, l):
        return jax.random.uniform(keys[i], l.shape, jnp.float32)

    return _prune_conv_by_scores(params, score, px, mask)


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
    """SNIP importance as the reference computes it: |∂L/∂w| alone
    (pruner/utils.py:208-227 snip_importance_score — the reference drops
    the SNIP paper's ⊙w factor; parity follows the code). The reference
    feeds a class-balanced batch (fetch_data, utils.py:179-199) — that
    is the caller's job."""
    g = loss_grad_fn(params, batch)
    return jax.tree.map(jnp.abs, g)


GRASP_TEMPERATURE = 200.0  # utils.py:234 — loss on model(x)/200


def grasp_scores(loss_grad_fn, params, batch):
    """GraSP: -w ⊙ (H·ĝ), with the exact double-backward HVP the
    reference uses (pruner/utils.py:229-245): g = ∂L/∂w with the loss on
    temperature-scaled logits (the caller's ``loss_grad_fn`` must divide
    logits by :data:`GRASP_TEMPERATURE` for parity), then
    ∂⟨g, stop_grad(g)⟩/∂w = H·ĝ — exact, not finite-differenced."""
    g_hat = jax.lax.stop_gradient(loss_grad_fn(params, batch))

    def inner(p):
        g = loss_grad_fn(p, batch)
        return sum(
            jnp.vdot(a, b)
            for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_hat))
        )

    hg = jax.grad(inner)(params)
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


def prune_by_scores(params, scores, px: float, mask=None, n_remaining=None):
    """Keep the global top (1-px of remaining) conv kernels by score."""
    score_leaves = jax.tree.leaves(scores)
    return _prune_conv_by_scores(
        params, lambda i, l: score_leaves[i].astype(jnp.float32), px, mask,
        n_remaining,
    )


def synflow_prune(model, params, px: float, input_shape,
                  iterations: int = 100):
    """Iterative SynFlow (pruner/utils.py:289-316 global_prune_model):
    ``iterations`` rounds at per-round ratio 1-(1-px)^(1/iterations),
    scores recomputed on the masked params each round, each round pruning
    that fraction of the *remaining* weights (the torch
    PruningContainer semantics — see :func:`_prune_conv_by_scores`).
    The reference fixes iterations=100 ("an iteration number of 100
    performs well", utils.py:304-306)."""
    each = 1.0 - (1.0 - px) ** (1.0 / iterations)
    mask = None
    # thread the remaining-count through the loop in Python: round k's
    # n_remaining is exactly round k-1's keep, so no per-round device
    # fetch is needed to recount it
    n_rem = sum(int(p.size) for p in jax.tree.leaves(params)
                if is_conv_kernel(p))
    for _ in range(iterations):
        eff = apply_prune_mask(params, mask)
        scores = synflow_scores(model, eff, input_shape)
        mask = prune_by_scores(params, scores, each, mask,
                               n_remaining=n_rem)
        n_rem = n_rem - round(each * n_rem)
    return mask
