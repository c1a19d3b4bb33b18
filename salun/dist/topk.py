"""Global top-k selection over (optionally sharded) parameter pytrees.

The reference materializes the concatenation of every parameter tensor and
double-argsorts it on one device (Classification/generate_mask.py:57-80) —
O(N log N) and O(N) temporary memory. On TPU we instead find the exact k-th
largest value by bisection on the order-preserving uint32 image of the
floats: O(N) per round, 32 rounds, no giant sort, and every reduction is a
plain ``sum`` that XLA turns into ``psum`` when the operand is sharded over
a mesh.

Tie-breaking parity: the reference sorts ``-|g|`` with a stable argsort, so
among equal values the *earlier flat index wins*. We reproduce that exactly:
elements strictly above the threshold are all selected; ties at the threshold
are selected in ascending flat-index order until k is reached.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SIGN = 0x80000000


def _f32_to_ordered_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Map float32 → uint32 preserving order (IEEE754 total-order trick)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    neg = bits >= jnp.uint32(_SIGN)
    return jnp.where(neg, ~bits, bits | jnp.uint32(_SIGN))


def _ordered_u32_to_f32(u: jnp.ndarray) -> jnp.ndarray:
    neg = u < jnp.uint32(_SIGN)
    bits = jnp.where(neg, ~u, u & jnp.uint32(_SIGN - 1))
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _bisect_kth(count_ge, k):
    """Largest uint32 v with count_ge(v) >= k, via 32-step bisection.

    ``count_ge`` maps a uint32 scalar to the number of elements >= it (in
    ordered-uint32 space); it is monotone non-increasing, so the set of v
    with count_ge(v) >= k is a prefix — we want its right edge, which is
    exactly the ordered image of the k-th largest element.
    """

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // jnp.uint32(2)
        c = count_ge(mid)
        return jax.lax.cond(
            c >= k,
            lambda: (mid + jnp.uint32(1), hi),
            lambda: (lo, mid - jnp.uint32(1)),
        )

    lo = jnp.uint32(0)
    hi = jnp.uint32(0xFFFFFFFF)
    lo, _ = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return lo - jnp.uint32(1)


def kth_largest(flat: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Exact k-th largest value (1-indexed) of a float32 array.

    Works unchanged when ``flat`` is sharded: the reductions become
    cross-device psums under jit.
    """
    ord_x = _f32_to_ordered_u32(flat)
    k = jnp.asarray(k, jnp.int32)
    tau_u = _bisect_kth(lambda v: jnp.sum(ord_x >= v), k)
    return _ordered_u32_to_f32(tau_u)


def kth_largest_threshold(tree, k) -> jnp.ndarray:
    """Exact k-th largest value (1-indexed) across ALL leaves of a pytree.

    The pytree analogue of :func:`kth_largest`: no concatenated copy is
    materialized — per-leaf counts are summed, so under jit with sharded
    leaves every reduction becomes a psum. Unlike :func:`global_topk_masks`
    (static k, builds masks), ``k`` may be a *traced* int32 scalar, which is
    what the proximal methods need — their threshold rank decays per step
    inside the jitted program (Classification/unlearn/RL_pro.py:53-62,
    SD/train-scripts/proximal_gradient.py:144-180).
    """
    ords = [_f32_to_ordered_u32(l.reshape(-1)) for l in jax.tree.leaves(tree)]
    tau_u = _bisect_kth(lambda v: sum(jnp.sum(o >= v) for o in ords),
                        jnp.asarray(k, jnp.int32))
    return _ordered_u32_to_f32(tau_u)


def global_topk_masks(abs_tree, k: int):
    """Exact top-k 0/1 masks over a pytree of |saliency| tensors.

    Semantics identical to the reference's stable double-argsort
    (generate_mask.py:57-80): top-k by value, ties broken by ascending flat
    index in pytree-concatenation order. Returns a pytree of float32 0/1
    masks with the leaves' shapes.

    Implementation: exact threshold tau via bisection; select all elements
    > tau; among == tau select the first (k - count(>tau)) in flat order via
    a cross-leaf running cumsum. No concatenated copy of the parameters is
    ever materialized — only reductions and one elementwise pass per leaf,
    so the whole thing shards trivially over a mesh.
    """
    leaves, treedef = jax.tree.flatten(abs_tree)
    total = sum(int(l.size) for l in leaves)
    if k <= 0:
        zeros = [jnp.zeros_like(l, dtype=jnp.float32) for l in leaves]
        return jax.tree.unflatten(treedef, zeros)
    if k >= total:
        ones = [jnp.ones_like(l, dtype=jnp.float32) for l in leaves]
        return jax.tree.unflatten(treedef, ones)

    k_arr = jnp.asarray(k, dtype=jnp.int32)
    ord_leaves = [_f32_to_ordered_u32(l.reshape(-1)) for l in leaves]

    def count_ge(v):
        return sum(jnp.sum(o >= v) for o in ord_leaves)

    tau_u = _bisect_kth(count_ge, k_arr)
    tau = _ordered_u32_to_f32(tau_u)

    # Admit everything strictly greater, then ties in flat order.
    n_gt = sum(jnp.sum(o > tau_u) for o in ord_leaves)
    n_ties_needed = k_arr - n_gt

    masks = []
    tie_offset = jnp.int32(0)  # ties consumed by earlier leaves
    for l, o in zip(leaves, ord_leaves):
        is_tie = (o == tau_u).astype(jnp.int32)
        # rank of each tie within the global tie order (ascending flat index)
        tie_rank = jnp.cumsum(is_tie) - 1 + tie_offset
        sel = (o > tau_u) | ((o == tau_u) & (tie_rank < n_ties_needed))
        tie_offset = tie_offset + jnp.sum(is_tie)
        masks.append(sel.reshape(l.shape).astype(jnp.float32))
    del tau
    return jax.tree.unflatten(treedef, masks)
