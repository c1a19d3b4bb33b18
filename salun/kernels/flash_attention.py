"""Pallas TPU flash attention (blockwise online softmax).

One O(N)-memory kernel covering every attention in the framework
(DDPM spatial attention, SD self/cross attention, OpenAI-UNet QKV). The
reference instead materializes the full [N,N] score matrix
(DDPM/models/diffusion.py:170-186, SD ldm/modules/attention.py:149-194) and
falls back to gradient checkpointing to fit memory — the flash kernel makes
that unnecessary (SURVEY.md §5.7).

Layout: q [B, Nq, D], k/v [B, Nk, D], single head (callers fold heads into
B). Grid = (B, Nq/BQ); each program streams K/V in BK-sized blocks from
VMEM, maintaining the running max / denominator / accumulator in fp32
scratch — the standard online-softmax recurrence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BQ = 256
DEFAULT_BK = 512


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, bk: int):
    q = q_ref[0].astype(jnp.float32) * scale          # [BQ, D]
    nk = k_ref.shape[1]
    bq, d = q.shape
    num_kb = nk // bk

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)   # [BK, D]
        v = v_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)   # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                         # [BQ, BK]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, scale: float,
    block_q: int = DEFAULT_BQ, block_k: int = DEFAULT_BK,
) -> jnp.ndarray:
    """softmax(q·kᵀ·scale)·v with O(N) memory. Shapes [B, N, D]."""
    b, nq, d = q.shape
    nk = k.shape[1]
    bq = min(block_q, nq)
    bk = min(block_k, nk)
    assert nq % bq == 0 and nk % bk == 0, (nq, nk, bq, bk)

    grid = (b, nq // bq)
    kernel = functools.partial(_flash_kernel, scale=scale, bk=bk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda ib, iq: (ib, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda ib, iq: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda ib, iq: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda ib, iq: (ib, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nq * nk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize * 2,
            transcendentals=b * nq * nk,
        ),
    )(q, k, v)
