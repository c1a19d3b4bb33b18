"""Expert parallelism: a switch-routed MoE layer over a mesh axis.

The reference has no mixture-of-experts — this module exists so the
framework covers every scale axis a production deployment needs (dp /
tp / pp / sp / ep; SURVEY.md §2.5 notes the reference stops at
DataParallel). It is the canonical TPU formulation (Switch Transformer,
Fedus et al., arXiv:2101.03961): top-1 routing with a capacity limit,
token dispatch/combine as einsums against a one-hot dispatch tensor (MXU
work, no gathers), and the device exchange as a single ``all_to_all``
per direction riding ICI.

Layout: tokens AND experts shard over the same mesh axis (DeepSpeed-MoE
style — expert parallelism reuses the data axis). Each device holds
``E/p`` experts and ``T/p`` tokens; the first ``all_to_all`` moves every
token to its expert's device, the second moves results back. Everything
is differentiable (``all_to_all`` has a transpose rule), so
``jax.grad`` through :func:`moe_apply` emits the reverse exchange.

The router aux loss is the standard load-balancing term
``E · Σ_e f_e · P_e`` (fraction of tokens dispatched to expert e times
mean router probability of e), computed over the GLOBAL batch via
``psum`` so it is identical to the single-device value.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def expert_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the stacked expert axis over ``axis``."""
    return NamedSharding(mesh, P(axis))


def _moe_body(gate_w, expert_params, x, *, expert_fn, axis: str,
              n_experts: int, capacity: int, p: int):
    """Per-device program: x [t, d] local tokens, expert_params leaves
    [E/p, ...] local experts → ([t, d], aux-loss scalar)."""
    t, d = x.shape
    e_local = n_experts // p

    # --- route (top-1 switch) ---
    logits = x @ gate_w                                   # [t, E]
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
    idx = jnp.argmax(probs, -1)                           # [t]
    gate = jnp.take_along_axis(probs, idx[:, None], -1)[:, 0]
    onehot = jax.nn.one_hot(idx, n_experts, dtype=jnp.float32)  # [t, E]

    # position of each token within its expert's send buffer; tokens past
    # the capacity are dropped (output 0 — the switch convention)
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0        # [t, E]
    keep = (pos >= 0) & (pos < capacity)
    dispatch = (onehot * keep).astype(x.dtype)[:, :, None] * jax.nn.one_hot(
        jnp.clip(pos, 0, capacity - 1).astype(jnp.int32), capacity,
        dtype=x.dtype)                                     # [t, E, cap]

    # --- exchange: tokens → their expert's device ---
    sent = jnp.einsum("td,tec->ecd", x, dispatch)          # [E, cap, d]
    sent = sent.reshape(p, e_local, capacity, d)
    recv = jax.lax.all_to_all(sent, axis, 0, 0, tiled=True)
    # recv[j, e] = tokens device j routed to local expert e
    inputs = recv.transpose(1, 0, 2, 3).reshape(e_local, p * capacity, d)

    # --- local experts (vmapped over the expert dim: one batched MXU op)
    outputs = jax.vmap(expert_fn)(expert_params, inputs)   # [E/p, p·cap, d]

    # --- exchange back + combine ---
    back = outputs.reshape(e_local, p, capacity, d).transpose(1, 0, 2, 3)
    ret = jax.lax.all_to_all(back, axis, 0, 0, tiled=True)
    ret = ret.reshape(n_experts, capacity, d)              # [E, cap, d]
    combine = dispatch * gate.astype(x.dtype)[:, None, None]
    y = jnp.einsum("ecd,tec->td", ret, combine)

    # --- load-balancing aux (global fractions via psum) ---
    f = jax.lax.psum(onehot.sum(0), axis) / jax.lax.psum(
        jnp.float32(t), axis)
    pmean = jax.lax.psum(probs.sum(0), axis) / jax.lax.psum(
        jnp.float32(t), axis)
    aux = n_experts * jnp.sum(f * pmean)
    return y, aux


def moe_apply(
    expert_fn: Callable,
    expert_params,
    gate_w: jnp.ndarray,
    x: jnp.ndarray,
    mesh: Mesh,
    *,
    axis: str = "data",
    capacity_factor: Optional[float] = None,
    capacity: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Switch-MoE layer: route each token of ``x`` [T, d] to one of ``E``
    experts, experts sharded ``E/p`` per device over ``axis``.

    ``expert_fn(params, h) -> h`` is one expert ([n, d] → [n, d]);
    ``expert_params`` leaves carry a leading expert dim of size E
    (sharded over ``axis`` — see :func:`expert_sharding`); ``gate_w``
    [d, E] is the (replicated) router. ``capacity`` is per expert per
    device-shard; default ``capacity_factor=1.25`` of the even-split
    load. Returns (y [T, d], load-balancing aux loss — add
    ``aux_weight * aux`` to the training loss).

    Exactness: with capacity ≥ local tokens, equals the dense per-token
    oracle (tests/test_moe.py asserts fwd and grads on the 8-way mesh).
    """
    p = mesh.shape[axis]
    n_experts = jax.tree.leaves(expert_params)[0].shape[0]
    if n_experts % p:
        raise ValueError(f"{n_experts} experts not divisible by "
                         f"{axis} axis size {p}")
    if x.shape[0] % p:
        raise ValueError(f"{x.shape[0]} tokens not divisible by "
                         f"{axis} axis size {p}")
    t_local = x.shape[0] // p
    if capacity is None:
        factor = 1.25 if capacity_factor is None else capacity_factor
        capacity = max(1, int(factor * t_local / n_experts + 0.5))

    fn = shard_map(
        partial(_moe_body, expert_fn=expert_fn, axis=axis,
                n_experts=n_experts, capacity=capacity, p=p),
        mesh=mesh,
        in_specs=(P(), jax.tree.map(lambda _: P(axis), expert_params),
                  P(axis)),
        out_specs=(P(axis), P()),
    )
    return fn(gate_w, expert_params, x)
