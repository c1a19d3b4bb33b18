"""Sequence-parallel (ring) attention over a mesh axis.

The reference never needs sequence parallelism — its longest attention
sequence is 4,096 latent tokens (SURVEY.md §5.7) — but the survey's
design note calls for the attention path to be block-parallel so a
``sequence`` mesh axis can be added without restructuring. This module
delivers that axis: exact attention with queries, keys, and values
sharded over a named mesh axis, computed as a ring.

Algorithm (Liu et al., "Ring Attention with Blockwise Transformers",
arXiv:2310.01889 — the standard TPU formulation): each of the ``p``
devices holds one sequence block of q/k/v. Every step, a device combines
its local q block with the currently-resident k/v block using the online-
softmax update (running max ``m``, normalizer ``l``, unnormalized
accumulator ``acc`` — the same fp32 running state as the Pallas flash
kernel, salun/kernels/flash_attention.py), then passes k/v to its ring
neighbor with ``ppermute``. After ``p`` steps every q block has attended
to the full sequence while no device ever materialized more than
N²/p² logits, and the k/v transfers ride ICI concurrently with compute.

Non-causal (all three reference attention sites — DDPM spatial, SD
self/cross, OpenAI-UNet QKV — are bidirectional). Differentiable end to
end: ``ppermute`` has a transpose rule, so ``jax.grad`` through
:func:`ring_attention` emits the reverse ring automatically.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _ring_body(q, k, v, scale: float, axis_name: str, p: int):
    """Local shard program: [B, n/p, C] blocks in, [B, n/p, C] out."""
    B, nq, C = q.shape
    # the running state must carry the same varying-manual-axis type as
    # the per-device q block or the scan carry types mismatch
    def _vary(x):
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(x, axis_name, to="varying")
        return jax.lax.pvary(x, axis_name)

    m = _vary(jnp.full((B, nq), -jnp.inf, jnp.float32))
    l = _vary(jnp.zeros((B, nq), jnp.float32))
    acc = _vary(jnp.zeros((B, nq, C), jnp.float32))
    perm = [(j, (j + 1) % p) for j in range(p)]

    def step(carry, _):
        m, l, acc, k, v = carry
        s = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) * scale
        m_new = jnp.maximum(m, s.max(axis=-1))
        w = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + w.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bqk,bkc->bqc", w, v.astype(jnp.float32))
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        return (m_new, l, acc, k, v), None

    # remat: without it the backward saves each step's [B, nq, nk] logits
    # as scan residuals — O(N²/p) per device, exactly the buffer ring
    # attention exists to avoid. Recompute them in the backward instead
    # (the flash-kernel tradeoff).
    (m, l, acc, k, v), _ = jax.lax.scan(
        jax.checkpoint(step), (m, l, acc, k, v), None, length=p)
    return (acc / l[..., None]).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    seq_axis: str = "data",
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact attention with the sequence dim sharded over ``seq_axis``.

    ``q``/``k``/``v`` are [B, N, C] with N divisible by the axis size;
    the output keeps the input sharding. Numerically matches
    ``scaled_dot_attention`` (tests/test_distributed.py asserts fwd and
    grads against the single-device oracle on an 8-way mesh).
    """
    p = mesh.shape[seq_axis]
    if q.shape[1] % p or k.shape[1] % p:
        raise ValueError(
            f"sequence {q.shape[1]}/{k.shape[1]} not divisible by "
            f"{seq_axis} axis size {p}")
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    spec = P(None, seq_axis, None)
    fn = shard_map(
        partial(_ring_body, scale=scale, axis_name=seq_axis, p=p),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    return fn(q, k, v)
