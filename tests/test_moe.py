"""Expert parallelism (salun/dist/moe.py): switch-MoE exactness vs the
dense per-token oracle on the 8-device virtual CPU mesh — forward,
gradients, aux loss, and capacity-drop behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salun.dist import make_mesh
from salun.dist.moe import expert_sharding, moe_apply


D, E, T = 8, 8, 32


def _expert(params, h):
    return jax.nn.gelu(h @ params["w1"]) @ params["w2"]


def _make(seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    expert_params = {
        "w1": jax.random.normal(k1, (E, D, 2 * D)) * D ** -0.5,
        "w2": jax.random.normal(k2, (E, 2 * D, D)) * (2 * D) ** -0.5,
    }
    gate_w = jax.random.normal(k3, (D, E)) * D ** -0.5
    x = jax.random.normal(k4, (T, D))
    return expert_params, gate_w, x


def _dense_oracle(expert_params, gate_w, x):
    """Every token through its argmax expert, weighted by its router
    prob — the no-drop reference the EP layer must reproduce."""
    probs = jax.nn.softmax((x @ gate_w).astype(jnp.float32), -1)
    idx = jnp.argmax(probs, -1)
    gate = jnp.take_along_axis(probs, idx[:, None], -1)[:, 0]
    all_out = jax.vmap(_expert, in_axes=(0, None))(expert_params, x)
    y = jnp.take_along_axis(
        all_out, idx[None, :, None], 0)[0] * gate[:, None].astype(x.dtype)
    f = jax.nn.one_hot(idx, E).mean(0)
    aux = E * jnp.sum(f * probs.mean(0))
    return y, aux


def test_moe_forward_matches_dense_oracle():
    mesh = make_mesh(data=8, model=1)
    expert_params, gate_w, x = _make()
    ep = jax.device_put(expert_params, expert_sharding(mesh, "data"))
    # capacity = local token count → nothing can drop → exact
    got, aux = jax.jit(lambda e, g, x: moe_apply(
        _expert, e, g, x, mesh, axis="data", capacity=T // 8))(
            ep, gate_w, x)
    want, want_aux = _dense_oracle(expert_params, gate_w, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(aux), float(want_aux),
                               rtol=1e-5, atol=1e-7)
    assert not got.sharding.is_fully_replicated, "EP output was gathered"


def test_moe_grads_match_dense_oracle():
    mesh = make_mesh(data=8, model=1)
    expert_params, gate_w, x = _make(seed=1)
    ep = jax.device_put(expert_params, expert_sharding(mesh, "data"))

    def ep_loss(e, g):
        y, aux = moe_apply(_expert, e, g, x, mesh, axis="data",
                           capacity=T // 8)
        return jnp.sum(y ** 2) + 0.01 * aux

    def dense_loss(e, g):
        y, aux = _dense_oracle(e, g, x)
        return jnp.sum(y ** 2) + 0.01 * aux

    got = jax.jit(jax.grad(ep_loss, argnums=(0, 1)))(ep, gate_w)
    want = jax.grad(dense_loss, argnums=(0, 1))(expert_params, gate_w)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        got, want)


def test_moe_capacity_drops_tokens_to_zero():
    """With capacity 1, tokens past the first per (shard, expert) are
    dropped to zero output (the switch convention); kept tokens still
    match the dense oracle exactly."""
    mesh = make_mesh(data=8, model=1)
    expert_params, gate_w, x = _make(seed=2)
    ep = jax.device_put(expert_params, expert_sharding(mesh, "data"))
    y, _ = jax.jit(lambda e, g, x: moe_apply(
        _expert, e, g, x, mesh, axis="data", capacity=1))(ep, gate_w, x)
    y = np.asarray(y)

    # replicate the routing math per device-shard to predict the keep set
    idx = np.asarray(jnp.argmax(jax.nn.softmax(
        (x @ gate_w).astype(jnp.float32), -1), -1))
    per_shard = T // 8
    kept = np.zeros(T, bool)
    for s in range(8):
        seen = set()
        for i in range(s * per_shard, (s + 1) * per_shard):
            if idx[i] not in seen:
                kept[i] = True
                seen.add(idx[i])
    assert kept.sum() < T, "seed produced no drops; test is vacuous"
    want, _ = _dense_oracle(expert_params, gate_w, x)
    want = np.asarray(want)
    np.testing.assert_allclose(y[kept], want[kept], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(y[~kept], 0.0, atol=1e-7)


def test_moe_rejects_bad_shapes():
    mesh = make_mesh(data=8, model=1)
    expert_params, gate_w, x = _make()
    bad = jax.tree.map(lambda p: p[:6], expert_params)  # 6 experts / 8 dev
    with pytest.raises(ValueError, match="divisible"):
        moe_apply(_expert, bad, gate_w, x, mesh, axis="data")
    with pytest.raises(ValueError, match="tokens"):
        moe_apply(_expert, expert_params, gate_w, x[:30], mesh, axis="data")


def test_moe_on_2d_mesh_data_axis():
    """EP over the data axis of a (4, 2) mesh — the model axis must stay
    inert (inputs replicated over it; aux loss invariant)."""
    mesh = make_mesh(data=4, model=2)
    expert_params, gate_w, x = _make(seed=3)
    ep = jax.device_put(expert_params, expert_sharding(mesh, "data"))
    got, aux = jax.jit(lambda e, g, x: moe_apply(
        _expert, e, g, x, mesh, axis="data", capacity=T // 4))(
            ep, gate_w, x)
    want, want_aux = _dense_oracle(expert_params, gate_w, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(aux), float(want_aux),
                               rtol=1e-5, atol=1e-7)
