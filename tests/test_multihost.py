"""Multi-host helpers (salun/dist/multihost.py): process-shard math for
arbitrary fleet sizes, host-local→global array assembly on the 8-device
mesh, and the no-op initialize path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from salun.dist import make_mesh
from salun.dist.multihost import (
    host_local_to_global, initialize, process_shard,
)


@pytest.mark.parametrize("n,count", [(100, 1), (100, 4), (7, 3), (8, 8),
                                     (5, 8)])
def test_process_shard_disjoint_exhaustive(n, count):
    spans = [process_shard(n, pid, count) for pid in range(count)]
    covered = []
    for start, stop in spans:
        assert 0 <= start <= stop <= n
        covered.extend(range(start, stop))
    assert covered == list(range(n))
    sizes = [stop - start for start, stop in spans]
    assert max(sizes) - min(sizes) <= 1


def test_process_shard_rejects_bad_pid():
    with pytest.raises(ValueError, match="outside"):
        process_shard(10, 5, 4)


def test_host_local_to_global_matches_device_put():
    mesh = make_mesh(data=8, model=1)
    batch = {
        "image": np.random.RandomState(0).rand(16, 4, 4, 3).astype(
            np.float32),
        "label": np.arange(16, dtype=np.int32),
    }
    start, stop = process_shard(16)  # single-process: the whole batch
    local = jax.tree.map(lambda x: x[start:stop], batch)
    got = host_local_to_global(mesh, P("data"), local)
    want = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), got, want)
    assert got["image"].sharding == want["image"].sharding
    # and it feeds a jitted step like any other sharded array
    s = jax.jit(lambda b: jnp.sum(b["image"]))(got)
    np.testing.assert_allclose(float(s), batch["image"].sum(), rtol=1e-6)


def test_initialize_is_noop_single_process():
    initialize()  # must not raise or hang on the single-process CPU path
    assert jax.process_count() == 1
