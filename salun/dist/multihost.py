"""Multi-host (TPU pod) runtime helpers.

A v5e-8 slice is single-host, but pods beyond 8 chips span hosts: each
process sees only its local devices, data loading happens per-process,
and global ``jax.Array``s are assembled from host-local shards. The
reference never runs multi-node (SURVEY.md §2.5 — DataParallel tops out
at one machine); these helpers make the same jitted steps pod-ready:

- :func:`initialize` — ``jax.distributed.initialize`` with env-var
  autodetection, safe to call unconditionally (no-op single-process).
- :func:`process_shard` — which dataset indices this process owns
  (disjoint, exhaustive; the host-side analogue of a ``data``-axis
  sharding).
- :func:`host_local_to_global` — assemble a global device array from
  each process's local batch (``jax.make_array_from_process_local_data``),
  the standard pod input-pipeline pattern: every process feeds only its
  local devices, GSPMD sees one logical array.

Everything here works unchanged at process_count=1 (tested on the
8-virtual-device CPU mesh, tests/test_multihost.py); multi-process
behavior is jax.distributed's, not ours.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the multi-process runtime. No-op when single-process with
    no coordinator configured (the common dev path), or when already
    initialized — so drivers may call this unconditionally at startup.

    On TPU pods the three arguments autodetect from the environment
    (jax.distributed reads the TPU metadata); on CPU/GPU fleets pass them
    or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    import importlib.util

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    # Deliberately avoid jax.process_count()/default_backend() here: they
    # initialize the backend, and jax.distributed.initialize must run
    # FIRST. Detect "pod-shaped" environments without touching jax.
    on_tpu_host = importlib.util.find_spec("libtpu") is not None
    if coordinator_address is None and num_processes is None \
            and not on_tpu_host:
        return  # single-process dev run; nothing to do
    # Explicit multi-process intent must never be silently downgraded to
    # a single-process run (every process would then load the FULL
    # dataset and train on duplicated data with no error).
    multiproc_intent = (coordinator_address is not None
                        or num_processes is not None
                        or process_id is not None)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        msg = str(e).lower()
        # jax 0.9: repeat call raises "distributed.initialize should only
        # be called once."; tolerate it (and close variants) so drivers
        # can call this unconditionally.
        if "only be called once" in msg or "already" in msg:
            return
        if "must be called before" in msg and not multiproc_intent:
            # backend already live in a single-process run (a late call);
            # with multi-process intent this is a real ordering bug.
            return
        raise
    except ValueError as e:
        if "coordinator_address" in str(e) and not multiproc_intent:
            # libtpu present but autodetection found no cluster: a
            # single-host dev session, not a misconfigured pod.
            return
        raise


def process_shard(
    n: int,
    process_id: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Tuple[int, int]:
    """[start, stop) of the dataset slice this process loads.

    Disjoint and exhaustive across processes; remainder items go to the
    leading processes (sizes differ by at most 1 — callers that need
    equal per-process batches should drop to ``(n // count) * count``
    first, the same convention as the data loaders' drop_last).
    """
    pid = jax.process_index() if process_id is None else process_id
    count = jax.process_count() if process_count is None else process_count
    if not 0 <= pid < count:
        raise ValueError(f"process_id {pid} outside [0, {count})")
    base, rem = divmod(n, count)
    start = pid * base + min(pid, rem)
    return start, start + base + (1 if pid < rem else 0)


def host_local_to_global(mesh: Mesh, pspec: P, host_batch):
    """Assemble global jax.Arrays from this process's local batch shard.

    ``host_batch`` is a pytree of host arrays holding ONLY this process's
    rows (``process_shard`` of the global batch); the result is a pytree
    of global arrays sharded per ``pspec`` over ``mesh``, identical on
    every process. Single-process this equals ``jax.device_put`` with the
    same sharding (asserted in tests/test_multihost.py).
    """
    sharding = NamedSharding(mesh, pspec)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        host_batch)
