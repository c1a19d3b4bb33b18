"""Masked-optimizer semantics (parity with Classification/unlearn/RL.py:11-34)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from salun.core.masked_opt import build_optimizer, mask_grads, masked, sgd


def torch_sgd_reference(p, g, buf, lr, momentum, wd):
    """Numpy re-derivation of torch.optim.SGD (momentum, weight_decay)."""
    d_p = g + wd * p
    buf = momentum * buf + d_p if buf is not None else d_p
    return p - lr * buf, buf


def test_sgd_matches_real_torch_sgd(rng):
    """Golden parity against the actual torch.optim.SGD trajectory."""
    torch = pytest.importorskip("torch")

    p0 = rng.standard_normal((7, 5)).astype(np.float32)
    grads = [rng.standard_normal((7, 5)).astype(np.float32) for _ in range(5)]

    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.SGD([tp], lr=0.1, momentum=0.9, weight_decay=5e-4)

    tx = sgd(0.1, momentum=0.9, weight_decay=5e-4)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.tensor(g)
        opt.step()
        upd, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, upd)
        np.testing.assert_allclose(
            np.asarray(params["w"]), tp.detach().numpy(), rtol=1e-5, atol=1e-6
        )


def test_sgd_matches_torch_semantics(rng):
    p0 = rng.standard_normal((5, 3)).astype(np.float32)
    tx = sgd(0.1, momentum=0.9, weight_decay=5e-4)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)

    p_ref, buf = p0, None
    p = params
    for step in range(3):
        g = rng.standard_normal((5, 3)).astype(np.float32)
        upd, state = tx.update({"w": jnp.asarray(g)}, state, p)
        p = optax.apply_updates(p, upd)
        p_ref, buf = torch_sgd_reference(p_ref, g, buf, 0.1, 0.9, 5e-4)
        np.testing.assert_allclose(np.asarray(p["w"]), p_ref, rtol=1e-5, atol=1e-6)


def test_masked_pins_theta0(rng):
    p0 = rng.standard_normal((4, 4)).astype(np.float32)
    mask = (rng.random((4, 4)) > 0.5).astype(np.float32)
    params = {"w": jnp.asarray(p0)}
    theta0 = {"w": jnp.asarray(p0)}
    m = {"w": jnp.asarray(mask)}

    tx = masked(sgd(0.05, 0.9, 5e-4), m, theta0)
    state = tx.init(params)
    p = params
    for _ in range(5):
        g = rng.standard_normal((4, 4)).astype(np.float32)
        upd, state = tx.update({"w": jnp.asarray(g)}, state, p)
        p = optax.apply_updates(p, upd)

    got = np.asarray(p["w"])
    # masked-out coords exactly theta0 (RL.py:25-29)
    np.testing.assert_array_equal(got[mask == 0], p0[mask == 0])
    # masked-in coords actually moved
    assert np.abs(got[mask == 1] - p0[mask == 1]).min() > 0


def test_masked_matches_unmasked_on_selected_coords(rng):
    """With momentum zeroing + theta0 pinning, the trajectory of selected
    coordinates must be unaffected by masked-out coordinates when weight
    decay doesn't couple them (it doesn't: SGD wd is elementwise)."""
    p0 = rng.standard_normal((6,)).astype(np.float32)
    mask = np.array([1, 1, 0, 0, 1, 0], dtype=np.float32)
    grads = [rng.standard_normal((6,)).astype(np.float32) for _ in range(4)]

    tx_m = masked(sgd(0.1, 0.9, 5e-4), {"w": jnp.asarray(mask)}, {"w": jnp.asarray(p0)})
    tx_u = sgd(0.1, 0.9, 5e-4)
    pm = {"w": jnp.asarray(p0)}
    pu = {"w": jnp.asarray(p0)}
    sm, su = tx_m.init(pm), tx_u.init(pu)
    for g in grads:
        um, sm = tx_m.update({"w": jnp.asarray(g)}, sm, pm)
        pm = optax.apply_updates(pm, um)
        uu, su = tx_u.update({"w": jnp.asarray(g)}, su, pu)
        pu = optax.apply_updates(pu, uu)
    np.testing.assert_allclose(
        np.asarray(pm["w"])[mask == 1], np.asarray(pu["w"])[mask == 1],
        rtol=1e-6, atol=1e-7,
    )


def test_mask_grads_only(rng):
    mask = {"w": jnp.asarray(np.array([1.0, 0.0, 1.0], np.float32))}
    tx = optax.chain(mask_grads(mask), optax.sgd(1.0))
    p = {"w": jnp.zeros(3)}
    upd, _ = tx.update({"w": jnp.ones(3)}, tx.init(p), p)
    np.testing.assert_array_equal(np.asarray(upd["w"]), [-1.0, 0.0, -1.0])


def test_build_optimizer_adam_masked(rng):
    mask = {"w": jnp.asarray(np.array([1.0, 0.0], np.float32))}
    theta0 = {"w": jnp.asarray(np.array([5.0, -5.0], np.float32))}
    tx = build_optimizer(1e-2, mask=mask, theta0=theta0, kind="adam")
    p = {"w": jnp.asarray(np.array([5.0, -5.0], np.float32))}
    s = tx.init(p)
    for _ in range(3):
        upd, s = tx.update({"w": jnp.ones(2)}, s, p)
        p = optax.apply_updates(p, upd)
    assert float(p["w"][1]) == -5.0
    assert float(p["w"][0]) != 5.0


def test_fused_matches_unfused(rng):
    """masked_sgd_fused must be trajectory-identical to masked(sgd(...))."""
    from salun.core.masked_opt import masked_sgd_fused

    p0 = {"a": rng.standard_normal((6, 4)).astype(np.float32),
          "b": rng.standard_normal((3,)).astype(np.float32)}
    mask = jax.tree.map(
        lambda p: jnp.asarray(rng.random(p.shape) > 0.5, jnp.float32), p0)
    theta0 = jax.tree.map(jnp.asarray, p0)

    tx_a = masked(sgd(0.05, 0.9, 5e-4), mask, theta0)
    tx_b = masked_sgd_fused(0.05, 0.9, 5e-4, mask, theta0)
    pa = jax.tree.map(jnp.asarray, p0)
    pb = jax.tree.map(jnp.asarray, p0)
    sa, sb = tx_a.init(pa), tx_b.init(pb)
    for i in range(4):
        g = jax.tree.map(
            lambda p: jnp.asarray(rng.standard_normal(p.shape), jnp.float32),
            p0)
        ua, sa = tx_a.update(g, sa, pa)
        pa = optax.apply_updates(pa, ua)
        ub, sb = tx_b.update(g, sb, pb)
        pb = optax.apply_updates(pb, ub)
        for x, y in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-7)
