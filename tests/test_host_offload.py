"""Host-memory offload (salun/dist/host_offload.py): pytree moves between
memory kinds, and an Adam run with host-resident optimizer state matching
the on-device trajectory bit-for-bit (the jit `out_shardings` pattern
from the module docstring)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from salun.dist import make_mesh
from salun.dist.host_offload import offloaded, state_shardings, to_device, \
    to_host


def _kinds(tree):
    return {k.sharding.memory_kind for k in jax.tree.leaves(tree)
            if hasattr(k, "sharding")}


def test_to_host_roundtrip_preserves_values_and_partitioning():
    mesh = make_mesh(data=8, model=1)
    tree = {"a": jnp.arange(32.0).reshape(8, 4), "b": jnp.ones((3,))}
    sharded = {
        "a": jax.device_put(tree["a"], jax.sharding.NamedSharding(
            mesh, P("data"))),
        "b": jax.device_put(tree["b"], jax.sharding.NamedSharding(
            mesh, P())),
    }
    hosted = to_host(sharded, mesh)
    assert _kinds(hosted) == {"pinned_host"}
    assert hosted["a"].sharding.spec == P("data")  # partitioning kept
    back = to_device(hosted, mesh)
    assert _kinds(back) == {"device"}
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(
        np.asarray(x), np.asarray(y)), back, tree)


def test_eager_between_steps_offload_matches_device_adam():
    """The backend-agnostic pattern: optimizer state parked on host
    BETWEEN jitted steps (eager to_device before / to_host after);
    trajectory bit-identical to the all-device run."""
    mesh = make_mesh(data=8, model=1)
    params = {"w": jnp.linspace(-1, 1, 24).reshape(6, 4),
              "b": jnp.zeros((4,))}
    tx = optax.adam(1e-2)
    s_ref = tx.init(params)
    s_host = to_host(tx.init(params), mesh)
    assert _kinds(s_host) == {"pinned_host"}

    @jax.jit
    def step(p, s, g):
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    p_ref, p_off = params, params
    for i in range(3):
        g = jax.tree.map(
            lambda x: jnp.cos(x + i).astype(x.dtype), params)
        p_ref, s_ref = step(p_ref, s_ref, g)
        p_off, s_dev = step(p_off, to_device(s_host, mesh), g)
        s_host = to_host(s_dev, mesh)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), p_ref, p_off)
    assert _kinds(s_host) == {"pinned_host"}


def test_offloaded_adam_in_graph_tpu_only():
    """The in-graph `offloaded` wrapper (stream-in/out inside the jitted
    step). The CPU runtime does not implement XLA's
    annotate_device_placement — skip there; on TPU/GPU this runs."""
    import pytest

    mesh = make_mesh(data=8, model=1)
    params = {"w": jnp.linspace(-1, 1, 24).reshape(6, 4),
              "b": jnp.zeros((4,))}

    tx_ref = optax.adam(1e-2)
    tx_off = offloaded(optax.adam(1e-2), mesh, min_size=4)
    s_ref, s_off = tx_ref.init(params), tx_off.init(params)
    # big moment leaves on host; Adam's scalar count stays on device
    assert _kinds(s_off) == {"pinned_host", "device"}

    def step(tx_update, p, s, g):
        u, s = tx_update(g, s, p)
        return optax.apply_updates(p, u), s

    step_ref = jax.jit(partial(step, tx_ref.update))
    host_out = state_shardings(optax.adam(1e-2), params, mesh, min_size=4)
    step_off = jax.jit(partial(step, tx_off.update),
                       out_shardings=(None, host_out))

    g = jax.tree.map(jnp.cos, params)
    try:
        p_off, s_off = step_off(params, s_off, g)
    except Exception as e:  # noqa: BLE001 — backend capability probe
        msg = str(e)
        if "annotate_device_placement" in msg:
            pytest.skip("backend lacks in-graph memory placement "
                        "(CPU runtime); eager pattern covered above")
        raise
    p_ref, _ = step_ref(params, s_ref, g)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), p_ref, p_off)
    assert "pinned_host" in _kinds(s_off)
