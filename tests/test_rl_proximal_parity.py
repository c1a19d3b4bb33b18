"""RL_proximal shrink-operator golden parity vs the reference's torch
snippet (salun/core/methods/rl_proximal.py::_proximal_shrink vs
Classification/unlearn/RL_pro.py:53-62): τ = ratio-th smallest |θ−θ₀|
via topk, then soft-threshold toward θ₀ — compared elementwise over a
multi-leaf pytree at several ratios, including the boundary element
(|d| == τ → pinned to θ₀)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from salun.core.methods.rl_proximal import _proximal_shrink


def _torch_shrink(params_flat, init_flat, ratio):
    params = torch.from_numpy(params_flat.copy())
    init_params = torch.from_numpy(init_flat.copy())
    diff_params = params - init_params
    threshold = -torch.topk(-diff_params.abs(), ratio)[0][-1]
    out = torch.where(
        diff_params > threshold, params - threshold,
        torch.where(diff_params < -threshold, params + threshold,
                    init_params))
    return out.numpy()


@pytest.mark.parametrize("ratio", [1, 7, 50, 149])
def test_proximal_shrink_matches_torch(ratio):
    rng = np.random.RandomState(ratio)
    leaves = {
        "a": rng.randn(10, 5).astype(np.float32),
        "b": rng.randn(25).astype(np.float32),
        "c": {"d": rng.randn(5, 5, 3).astype(np.float32)},
    }
    init = {
        "a": rng.randn(10, 5).astype(np.float32),
        "b": rng.randn(25).astype(np.float32),
        "c": {"d": rng.randn(5, 5, 3).astype(np.float32)},
    }
    flat = np.concatenate([leaves["a"].ravel(), leaves["b"].ravel(),
                           leaves["c"]["d"].ravel()])
    flat0 = np.concatenate([init["a"].ravel(), init["b"].ravel(),
                            init["c"]["d"].ravel()])
    want = _torch_shrink(flat, flat0, ratio)

    def as_jnp(tree):
        return jax.tree.map(jnp.asarray, tree)

    got = _proximal_shrink(as_jnp(leaves), as_jnp(init),
                           jnp.asarray(ratio, jnp.int32))
    got_flat = np.concatenate([
        np.asarray(got["a"]).ravel(), np.asarray(got["b"]).ravel(),
        np.asarray(got["c"]["d"]).ravel()])
    np.testing.assert_allclose(got_flat, want, rtol=0, atol=1e-7)


def test_proximal_shrink_pins_boundary_element():
    """The element whose |d| equals τ exactly must go to θ₀ (the
    reference's else-branch), not be shifted by τ."""
    p = jnp.asarray(np.array([1.0, 2.0, 3.0, -4.0], np.float32))
    t0 = jnp.zeros(4, jnp.float32)
    # ratio=2 → τ = 2nd smallest |d| = 2.0 → elements |d|≤2 pinned
    got = np.asarray(_proximal_shrink(p, t0, jnp.asarray(2, jnp.int32)))
    np.testing.assert_allclose(got, [0.0, 0.0, 1.0, -2.0], atol=1e-7)


@pytest.mark.parametrize("ratio", [3, 60])
def test_sd_proximal_shrink_matches_torch(ratio):
    """The SD variant (salun/sd/trainers.py::proximal_shrink vs
    proximal_gradient.py:144-180) — same soft-threshold math, checked
    against the same torch snippet."""
    from salun.sd.trainers import proximal_shrink

    rng = np.random.RandomState(100 + ratio)
    leaves = {"q": rng.randn(9, 9).astype(np.float32),
              "v": rng.randn(19).astype(np.float32)}
    init = {"q": rng.randn(9, 9).astype(np.float32),
            "v": rng.randn(19).astype(np.float32)}
    flat = np.concatenate([leaves["q"].ravel(), leaves["v"].ravel()])
    flat0 = np.concatenate([init["q"].ravel(), init["v"].ravel()])
    want = _torch_shrink(flat, flat0, ratio)

    got = proximal_shrink(jax.tree.map(jnp.asarray, leaves),
                          jax.tree.map(jnp.asarray, init),
                          jnp.asarray(ratio, jnp.int32))
    got_flat = np.concatenate([np.asarray(got["q"]).ravel(),
                               np.asarray(got["v"]).ravel()])
    np.testing.assert_allclose(got_flat, want, rtol=0, atol=1e-7)
