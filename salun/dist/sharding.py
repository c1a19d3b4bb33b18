"""Parameter-sharding rules (tensor parallelism over the ``model`` axis).

The reference has no TP (SURVEY.md §2.5); this is the extension point for
v5e-8-scale SD runs: megatron-style column/row-parallel attention + GEGLU
FF in the SD U-Net —

- attention to_q/to_k/to_v kernels [in, heads·dh] → shard output dim
  (heads split across the model axis);
- attention to_out_0 [heads·dh, out]              → shard input dim
  (row-parallel; XLA inserts one psum per attention block);
- GEGLU net_0_proj [d, 2·4d] → column-parallel; net_2 [4d, d] → row-parallel.

Everything else (convs, norms, embeddings) is replicated. GSPMD propagates
the activation shardings and inserts the collectives.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from salun.utils.tree import flatten_names, tree_from_flat

COLUMN_PARALLEL = ("to_q/kernel", "to_k/kernel", "to_v/kernel",
                   "net_0_proj/kernel")
ROW_PARALLEL = ("to_out_0/kernel", "net_2/kernel")


def sd_unet_pspecs(unet_params):
    """PartitionSpec pytree for the SD U-Net params."""
    flat = flatten_names(unet_params)
    specs = {}
    for name, v in flat.items():
        if any(name.endswith(s) for s in COLUMN_PARALLEL) and v.ndim == 2:
            specs[name] = P(None, "model")
        elif any(name.endswith(s) for s in ROW_PARALLEL) and v.ndim == 2:
            specs[name] = P("model", None)
        else:
            specs[name] = P()
    return tree_from_flat(specs)


def shard_params(params, mesh: Mesh, pspecs):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, pspecs
    )


def count_sharded(pspecs) -> int:
    return sum(
        1 for s in jax.tree.leaves(
            pspecs, is_leaf=lambda x: isinstance(x, P))
        if any(a is not None for a in s)
    )
