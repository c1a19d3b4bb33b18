"""Exactness of the distributed top-k vs the reference's double-argsort.

Reference semantics (Classification/generate_mask.py:57-80): stable argsort
of -|g| over the flat concatenation; mask=1 where rank < int(N*t).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salun.dist.topk import global_topk_masks, kth_largest


def reference_masks(flat_leaves, k):
    """Numpy re-derivation of generate_mask.py:57-80 (not a copy: same math)."""
    all_elements = -np.concatenate([l.reshape(-1) for l in flat_leaves])
    positions = np.argsort(all_elements, kind="stable")
    ranks = np.argsort(positions, kind="stable")
    out, start = [], 0
    for l in flat_leaves:
        n = l.size
        r = ranks[start : start + n]
        out.append((r < k).astype(np.float32).reshape(l.shape))
        start += n
    return out


@pytest.mark.parametrize("threshold", [0.0, 0.1, 0.5, 0.9, 1.0])
def test_topk_matches_double_argsort(rng, threshold):
    leaves = [
        rng.standard_normal((17, 9)).astype(np.float32) ** 2,
        rng.standard_normal((33,)).astype(np.float32) ** 2,
        rng.standard_normal((4, 5, 6)).astype(np.float32) ** 2,
    ]
    n = sum(l.size for l in leaves)
    k = int(n * threshold)
    want = reference_masks(leaves, k)
    got = global_topk_masks([jnp.asarray(l) for l in leaves], k)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, np.asarray(g))


def test_topk_with_ties(rng):
    # Heavy ties: quantized values force the stable-order tie-break path.
    leaves = [
        np.round(rng.random((50,)) * 4).astype(np.float32),
        np.round(rng.random((7, 8)) * 4).astype(np.float32),
    ]
    n = sum(l.size for l in leaves)
    for k in [1, 3, n // 2, n - 1]:
        want = reference_masks(leaves, k)
        got = global_topk_masks([jnp.asarray(l) for l in leaves], k)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(w, np.asarray(g))
        total = sum(float(np.asarray(g).sum()) for g in got)
        assert total == k


def test_kth_largest_exact(rng):
    x = rng.standard_normal(1001).astype(np.float32)
    for k in [1, 2, 500, 1000, 1001]:
        want = np.sort(x)[::-1][k - 1]
        got = kth_largest(jnp.asarray(x), jnp.int32(k))
        assert float(got) == float(want)


def test_topk_sharded_matches_single(rng, mesh8):
    """Sharding-invariance: the mask must be identical when the saliency
    tree is sharded over an 8-device mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    big = rng.standard_normal((64, 16)).astype(np.float32) ** 2
    small = rng.standard_normal((24,)).astype(np.float32) ** 2
    k = 300
    ref = global_topk_masks([jnp.asarray(big), jnp.asarray(small)], k)

    sharded_big = jax.device_put(big, NamedSharding(mesh8, P("data", None)))
    repl_small = jax.device_put(small, NamedSharding(mesh8, P()))
    got = jax.jit(lambda t: global_topk_masks(t, k))([sharded_big, repl_small])
    for w, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_scanned_accumulation_matches_streamed(key, rng):
    """accumulate_saliency_scanned == accumulate_saliency (same order,
    same |.|-after-sum semantics)."""
    import jax
    import jax.numpy as jnp

    from salun.core.mask import accumulate_saliency, accumulate_saliency_scanned

    params = {"w": jnp.asarray(rng.standard_normal((8, 8)), jnp.float32),
              "b": jnp.asarray(rng.standard_normal(8), jnp.float32)}

    def grad_fn(p, batch):
        def loss(p):
            return jnp.sum((batch["x"] @ p["w"] + p["b"]) ** 2)
        return jax.grad(loss)(p)

    batches = [{"x": jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)}
               for _ in range(5)]
    streamed = accumulate_saliency(grad_fn, params, batches)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    scanned = accumulate_saliency_scanned(grad_fn, params, stacked)
    for a, b in zip(jax.tree.leaves(streamed), jax.tree.leaves(scanned)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_kth_largest_threshold_pytree(rng):
    """Public pytree kth-largest (the proximal methods' threshold): exact
    vs numpy sort, including a traced k inside jit."""
    import jax
    import jax.numpy as jnp

    from salun.dist.topk import kth_largest_threshold

    tree = {"a": jnp.asarray(rng.standard_normal((7, 5)), jnp.float32),
            "b": jnp.asarray(rng.standard_normal(23), jnp.float32)}
    flat = np.sort(np.abs(np.concatenate(
        [np.asarray(l).ravel() for l in jax.tree.leaves(tree)])))[::-1]
    abs_tree = jax.tree.map(jnp.abs, tree)
    for k in (1, 3, 17, flat.size):
        got = jax.jit(kth_largest_threshold)(abs_tree, jnp.int32(k))
        assert float(got) == flat[k - 1], k
