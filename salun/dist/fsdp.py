"""FSDP-style (ZeRO-3) parameter + optimizer-state sharding.

The reference replicates every model on every GPU (torch DataParallel,
SURVEY.md §2.5). On TPU the framework instead shards each parameter
leaf's largest mesh-divisible axis over the ``data`` axis and lets
XLA/GSPMD insert the all-gathers at use sites and reduce-scatters for
the gradients — params, Adam moments, and masks all split N-ways.

Why it matters at reference scale: the SD v1 U-Net is 859.5M params;
fp32 params + Adam mu/nu + grads ≈ 13.7 GB replicated — tight against a
16 GB v5e chip before activations. Sharded 8-ways it is ~1.7 GB/chip.

Masks and θ₀ pytrees (state-carried by the masked optimizers,
salun.core.masked_opt) are parameter-shaped, so they shard with the same
specs for free.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_pspecs(params, mesh: Mesh, axis: str = "data",
                min_size: int = 2 ** 12):
    """PartitionSpec pytree sharding each leaf's largest divisible dim.

    Leaves smaller than ``min_size`` elements (biases, norm scales) stay
    replicated — sharding them costs more in collective latency than the
    bytes saved.
    """
    n = mesh.shape[axis]

    def spec_for(v):
        if v.size < min_size or n == 1:
            return P()
        for i in sorted(range(v.ndim), key=lambda i: -v.shape[i]):
            if v.shape[i] % n == 0:
                spec = [None] * v.ndim
                spec[i] = axis
                return P(*spec)
        return P()

    return jax.tree.map(spec_for, params)


def shard_fsdp(tree, mesh: Mesh, pspecs=None, axis: str = "data"):
    """Place a parameter-shaped pytree with FSDP shardings."""
    if pspecs is None:
        pspecs = fsdp_pspecs(tree, mesh, axis=axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, pspecs
    )


def count_sharded(pspecs) -> int:
    return sum(
        1 for s in jax.tree.leaves(pspecs,
                                   is_leaf=lambda x: isinstance(x, P))
        if any(a is not None for a in s)
    )
