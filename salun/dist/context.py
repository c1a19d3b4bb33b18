"""Production-driver mesh context.

The reference ships its parallelism inside the product path
(torch.nn.DataParallel wrapping the DDPM U-Net in the runner,
DDPM/runners/diffusion.py:203,504,628; 2-GPU placement in
SD/train-scripts/train-esd.py:119-126). The TPU equivalent here: a CLI
flag (``--dp N``) builds a ``jax.sharding.Mesh`` and *activates* it for
the run; every batch-ingestion site in the framework
(``core.train.run_epoch`` / ``validate``, the DDPM runner loops, the SD
trainer loop) routes host batches through :func:`ingest`, which shards
the batch dimension over the ``data`` axis whenever a mesh is active.
The step functions themselves are sharding-transparent jit programs —
GSPMD inserts the gradient all-reduces over ICI — so activating a mesh
changes placement only, never the math (CLI-level equivalence is pinned
by tests/test_cli_mesh.py).

Design note: an *ambient* context (module global + context manager)
rather than a ``mesh`` argument threaded through every method signature.
The 17 unlearning methods, the epoch runners, and three workload drivers
all ingest batches; one ambient placement policy keeps the method zoo's
uniform ``method(loaders, model, state, cfg)`` signature intact.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE: Optional[Mesh] = None


def active_mesh() -> Optional[Mesh]:
    """The mesh activated by the current driver, or None (single device)."""
    return _ACTIVE


@contextlib.contextmanager
def activate(mesh: Optional[Mesh]):
    """Activate ``mesh`` for the dynamic extent (None = no-op)."""
    global _ACTIVE
    prev, _ACTIVE = _ACTIVE, mesh
    try:
        yield mesh
    finally:
        _ACTIVE = prev


def mesh_from_flags(dp: int = 0, devices=None) -> Optional[Mesh]:
    """Build the (data,) mesh requested by a ``--dp N`` CLI flag.

    ``dp`` of 0/1 returns None (the pre-existing single-device path);
    ``dp > 1`` must match an available device count.
    """
    if not dp or dp <= 1:
        return None
    from salun.dist.mesh import make_mesh

    devices = list(devices if devices is not None else jax.devices())
    if dp > len(devices):
        raise ValueError(
            f"--dp {dp} but only {len(devices)} devices visible "
            f"({[d.platform for d in devices[:3]]}...); on CPU use "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={dp}")
    return make_mesh(data=dp, model=1, devices=devices[:dp])


def shard_batch_dim(mesh: Mesh, tree, dim: int = 0):
    """Place a host batch with axis ``dim`` sharded over ``data`` where
    divisible; leaves that don't divide (ragged tails, per-batch RNG keys)
    are replicated — correct either way, parallel when possible."""
    n = mesh.shape["data"]

    def put(x):
        ndim = getattr(x, "ndim", 0)
        spec = [None] * ndim
        if ndim > dim and x.shape[dim] and x.shape[dim] % n == 0:
            spec[dim] = "data"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(put, tree)


def ingest(batch, dim: int = 0):
    """Move a host batch to device: sharded over the active mesh's ``data``
    axis at ``dim`` when a mesh is active, plain ``jnp.asarray`` otherwise.
    This is THE batch device-boundary for every driver loop."""
    if _ACTIVE is None:
        return jax.tree.map(jnp.asarray, batch)
    return shard_batch_dim(_ACTIVE, batch, dim)


def constrain_batch(x, dim: int = 0):
    """``with_sharding_constraint`` over the active mesh's ``data`` axis —
    the in-graph counterpart of :func:`ingest` for arrays *created* on
    device (e.g. the initial noise of a sampling chain, which has no host
    batch to shard). No-op without an active mesh or when the batch dim
    doesn't divide; correct either way, parallel when possible."""
    if _ACTIVE is None:
        return x
    n = _ACTIVE.shape["data"]
    ndim = getattr(x, "ndim", 0)
    if ndim <= dim or not x.shape[dim] or x.shape[dim] % n:
        return x
    spec = [None] * ndim
    spec[dim] = "data"
    sharding = NamedSharding(_ACTIVE, P(*spec))
    if isinstance(x, jax.Array) and not isinstance(x, jax.core.Tracer):
        # concrete (eager) array: placement, not a trace-time constraint
        return jax.device_put(x, sharding)
    return jax.lax.with_sharding_constraint(x, sharding)


def place_replicated(tree, mesh: Optional[Mesh] = None):
    """Replicate model/optimizer state over the mesh (no-op when no mesh
    is active and none is given)."""
    mesh = mesh if mesh is not None else _ACTIVE
    if mesh is None:
        return tree
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
