"""Host-memory offload: park cold state in host RAM, not HBM.

The reference never needs this (its models fit a single GPU), but the
survey's dist/ plan (SURVEY.md §7 layout: ``host_offload``) calls for it
as the production memory-management lever: on TPU, HBM is the scarce
resource and XLA exposes per-array memory kinds (``device`` /
``pinned_host``) through shardings. Parking the optimizer state in host
memory halves the resident bytes of an Adam run (2 extra copies of the
params) at the cost of host↔HBM DMAs each step — the standard trade when
a model fits for inference but not for training state.

Two layers:
- :func:`to_host` / :func:`to_device` — move a pytree between memory
  kinds, keeping its partitioning. Work inside AND outside ``jit``
  (``jax.device_put`` with a memory-kind sharding lowers to a DMA).
- :func:`offloaded` — wrap any optax transformation so its state lives
  in ``pinned_host``: ``init`` parks the fresh state on host; ``update``
  streams it in, applies the wrapped transform, and streams the new
  state back out. Trajectories are bit-identical to the unwrapped
  optimizer (tests/test_host_offload.py).

Composes with the sharded checkpoint store (``ckpt.save_sharded``
accepts host-resident arrays like any other jax.Array).
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _move(tree, mesh, pspecs, kind: str):
    def one(x, spec):
        return jax.device_put(
            x, NamedSharding(mesh, spec, memory_kind=kind))
    if pspecs is None:
        # keep each leaf's current partitioning, change only the memory
        def keep(x):
            spec = getattr(getattr(x, "sharding", None), "spec", P())
            return one(x, spec)
        return jax.tree.map(keep, tree)
    return jax.tree.map(one, tree, pspecs)


def to_host(tree, mesh: Mesh, pspecs=None):
    """Move a pytree to ``pinned_host`` memory (partitioning preserved
    unless explicit ``pspecs`` are given)."""
    return _move(tree, mesh, pspecs, "pinned_host")


def to_device(tree, mesh: Mesh, pspecs=None):
    """Move a pytree back to device (HBM) memory."""
    return _move(tree, mesh, pspecs, "device")


def state_shardings(tx: optax.GradientTransformation, params, mesh: Mesh,
                    pspecs=None, min_size: int = 1024):
    """The per-leaf output shardings for an :func:`offloaded` state —
    pass as ``out_shardings`` for the state output of a jitted train
    step so the new state LANDS in host memory (jit otherwise commits
    outputs back to device memory regardless of in-graph placement)."""
    state = jax.eval_shape(tx.init, params)

    class _Unspecified:
        """Sentinel mapped to None at the end (None is a pytree node, so
        it can't flow through tree.map directly)."""

    def one(x, spec):
        if x.size >= min_size:
            return NamedSharding(mesh, spec, memory_kind="pinned_host")
        # leave small leaves unspecified: XLA's partitioner rejects
        # placement annotations on side-effect scalars (Adam's count)
        return _Unspecified()

    specs = pspecs if pspecs is not None else jax.tree.map(
        lambda _: P(), state)
    marked = jax.tree.map(one, state, specs)
    return jax.tree.map(
        lambda s: None if isinstance(s, _Unspecified) else s, marked,
        is_leaf=lambda s: isinstance(s, (_Unspecified, NamedSharding)))


def offloaded(tx: optax.GradientTransformation, mesh: Mesh,
              pspecs=None, min_size: int = 1024
              ) -> optax.GradientTransformation:
    """Any optax transformation with its state resident in host memory.

    Only leaves with ≥ ``min_size`` elements are offloaded — small
    leaves (Adam's step count, scalar schedules) stay on device both
    because they are free and because XLA's SPMD partitioner rejects
    host placement of side-effect scalars. ``pspecs``: optional pytree
    of PartitionSpecs for the state (default: replicated).

    The update runs host→HBM stream-in, wrapped update, HBM→host
    stream-out inside the caller's jit program. NOTE: jit commits its
    OUTPUTS to device memory unless told otherwise — to keep the new
    state host-resident across jitted steps, pass
    ``out_shardings=(..., state_shardings(tx, params, mesh))`` to
    ``jax.jit`` (tests/test_host_offload.py shows the pattern). Without
    it the math is unchanged; only the residency of the returned state
    differs.

    TPU/GPU only: in-graph placement lowers to XLA's
    ``annotate_device_placement``, which the CPU runtime does not
    implement (the CPU test skips on that error; the eager
    :func:`to_host`/:func:`to_device` between-steps pattern works on
    every backend and is tested unconditionally).
    """

    def _specs_for(state):
        # explicit per-leaf specs: inside jit the state leaves are
        # tracers with no .sharding to inherit from
        if pspecs is not None:
            return pspecs
        return jax.tree.map(lambda _: P(), state)

    def _put(x, spec, kind):
        if x.size < min_size:
            return x
        return jax.device_put(
            x, NamedSharding(mesh, spec, memory_kind=kind))

    def init(params):
        state = tx.init(params)
        return jax.tree.map(
            lambda x, s: _put(x, s, "pinned_host"), state,
            _specs_for(state))

    def update(updates, state, params=None):
        specs = _specs_for(state)
        on_device = jax.tree.map(
            lambda x, s: _put(x, s, "device"), state, specs)
        new_updates, new_state = tx.update(updates, on_device, params)
        return new_updates, jax.tree.map(
            lambda x, s: _put(x, s, "pinned_host"), new_state, specs)

    return optax.GradientTransformation(init, update)
