"""Sharded/async checkpointing (salun/ckpt/store.py::save_sharded /
restore_sharded): device-sharded saves with no host gather, restore into
a DIFFERENT mesh topology, and async (non-blocking) saves."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from salun.ckpt import restore_sharded, save_sharded
from salun.dist import make_mesh


def _params(seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return {
        "dense": {"kernel": jax.random.normal(k1, (16, 32)),
                  "bias": jnp.zeros((32,))},
        "head": {"kernel": jax.random.normal(k2, (32, 8))},
        "step": jnp.int32(7),
    }


def _shard(tree, mesh, spec_fn):
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, spec_fn(x))), tree)


def test_sharded_roundtrip_across_topologies(tmp_path):
    """Save FSDP-style sharded params on an 8-way mesh, restore into a
    4×2 mesh with a different partitioning — values identical, restored
    leaves carry the requested sharding (and stay sharded)."""
    params = _params()
    mesh8 = make_mesh(data=8, model=1)

    def spec8(x):
        return P("data") if x.ndim and x.shape[0] % 8 == 0 else P()

    sharded = _shard(params, mesh8, spec8)
    path = str(tmp_path / "ckpt_sharded")
    save_sharded(path, sharded)

    mesh42 = make_mesh(data=4, model=2)

    def spec42(x):
        if x.ndim >= 2 and x.shape[0] % 4 == 0 and x.shape[1] % 2 == 0:
            return P("data", "model")
        return P()

    like = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh42, spec42(x))),
        params)
    restored = restore_sharded(path, like)

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), restored, params)
    assert restored["dense"]["kernel"].sharding == NamedSharding(
        mesh42, P("data", "model"))
    assert not restored["dense"]["kernel"].sharding.is_fully_replicated


def test_async_save_overlaps_then_restores(tmp_path):
    """AsyncCheckpointer save returns before the write is durable;
    wait_until_finished() makes it so, and the artifact restores
    bit-exactly into jax.Array templates."""
    params = _params(seed=1)
    mesh = make_mesh(data=8, model=1)
    sharded = _shard(params, mesh,
                     lambda x: P("data") if x.ndim and x.shape[0] % 8 == 0
                     else P())
    path = str(tmp_path / "ckpt_async")
    ckptr = save_sharded(path, sharded, async_=True)
    ckptr.wait_until_finished()

    restored = restore_sharded(path, sharded)  # jax.Array template
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), restored, params)
    assert restored["dense"]["kernel"].sharding == \
        sharded["dense"]["kernel"].sharding
