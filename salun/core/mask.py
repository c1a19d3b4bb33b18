"""Weight-saliency mask generation — the core of SalUn.

One implementation over parameter pytrees, replacing the three copy-pasted
versions in the reference (Classification/generate_mask.py:14-82,
DDPM/runners/diffusion.py:933-1039, SD/train-scripts/generate_mask.py:8-211).

Algorithm (generate_mask.py:30-82):
  1. accumulate raw gradients of the forgetting loss over the forget set,
     summing per-batch (mean-reduced) grads;
  2. take elementwise absolute value;
  3. for each threshold t, build a hard 0/1 mask selecting the top
     ``int(N * t)`` coordinates globally across all parameters by |g|,
     ties broken by ascending flat index (stable argsort semantics).

TPU design: step 1 is a jitted donated-accumulator scan over batches (grads
never leave the device); step 3 uses an exact bucketed top-k
(salun.dist.topk) instead of the reference's double argsort over the full
concatenation — O(N) per pass, shards over a mesh with psum reductions.
"""

from __future__ import annotations

import weakref
from functools import partial
from typing import Callable, Iterable, Sequence

import jax
import jax.numpy as jnp

from salun.dist.topk import global_topk_masks
from salun.utils.tree import tree_size

# The reference sweep (generate_mask.py:50). DDPM/SD use only 0.5.
DEFAULT_THRESHOLDS = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0)


def accumulate_saliency(
    grad_fn: Callable,
    params,
    batches: Iterable,
    *,
    abs_value: bool = True,
):
    """Sum ``grad_fn(params, batch)`` over batches, then |.|.

    ``grad_fn`` returns the gradient pytree of the forgetting loss for one
    batch (classification: loss = -CE, generate_mask.py:36; diffusion
    variants pass their own loss). The accumulation step is jitted with a
    donated accumulator so XLA updates it in place; the jitted step is
    memoized per ``grad_fn`` so repeated calls (warmup + timed run,
    multiple epochs) reuse one compiled program instead of re-tracing a
    fresh closure each call.
    """
    acc_step = _acc_step_for(grad_fn)
    acc = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    for batch in batches:
        acc = acc_step(params, acc, batch)
    if abs_value:
        acc = _tree_abs(acc)
    return acc


def accumulate_saliency_scanned(
    grad_fn: Callable,
    params,
    stacked_batches,
    *,
    abs_value: bool = True,
):
    """One-dispatch saliency accumulation over pre-stacked batches.

    Same math as ``accumulate_saliency`` (sequential sum, |.| after), but
    the whole loop is a ``lax.scan`` inside ONE jitted program —
    ``stacked_batches`` is a batch pytree with an extra leading axis
    [n_batches, B, ...]. Use when the forget set fits device memory (the
    reference recipes: 4,500 CIFAR images ≈ 14 MB): per-batch dispatch
    latency disappears, which on a remote-execution backend dominates the
    streamed variant's wall-clock.
    """
    run = _ACC_SCANS.get(grad_fn)
    if run is None:

        @jax.jit
        def run(params, stacked):
            def body(acc, batch):
                g = grad_fn(params, batch)
                return jax.tree.map(
                    lambda a, b: a + b.astype(jnp.float32), acc, g), ()

            acc0 = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params)
            acc, _ = jax.lax.scan(body, acc0, stacked)
            return acc

        try:
            _ACC_SCANS[grad_fn] = run
        except TypeError:
            pass
    acc = run(params, stacked_batches)
    if abs_value:
        acc = _tree_abs(acc)
    return acc


_ACC_STEPS = weakref.WeakKeyDictionary()
_ACC_SCANS = weakref.WeakKeyDictionary()


def _acc_step_for(grad_fn):
    step = _ACC_STEPS.get(grad_fn)
    if step is None:

        @partial(jax.jit, donate_argnums=1)
        def step(params, acc, batch):
            g = grad_fn(params, batch)
            return jax.tree.map(
                lambda a, b: a + b.astype(jnp.float32), acc, g
            )

        try:
            _ACC_STEPS[grad_fn] = step
        except TypeError:  # non-weakrefable callable: skip memoization
            pass
    return step


@jax.jit
def _tree_abs(tree):
    return jax.tree.map(jnp.abs, tree)


def threshold_mask(abs_saliency, threshold: float):
    """Hard 0/1 mask keeping the top ``int(N*threshold)`` coords by |g|."""
    n = tree_size(abs_saliency)
    k = int(n * threshold)  # parity: threshold_index = int(len * i), :60
    return _topk_masks_jit(abs_saliency, k)


def generate_masks(
    abs_saliency,
    thresholds: Sequence[float] = DEFAULT_THRESHOLDS,
) -> dict:
    """Mask per threshold, as saved by the reference (``with_{t}.pt``)."""
    return {t: threshold_mask(abs_saliency, t) for t in thresholds}


from functools import partial


@partial(jax.jit, static_argnums=1)
def _topk_masks_jit(abs_tree, k):
    return global_topk_masks(abs_tree, k)


def saliency_stats(abs_saliency) -> dict:
    """Summary stats for logging/observability."""
    leaves = jax.tree.leaves(abs_saliency)
    total = sum(jnp.sum(l) for l in leaves)
    mx = jnp.stack([jnp.max(l) for l in leaves]).max()
    return {"sum": float(total), "max": float(mx), "numel": tree_size(abs_saliency)}
