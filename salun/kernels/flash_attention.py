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


# ----------------------------------------------------------------- backward
# Standard flash-attention backward: recompute P blockwise from (q, k, saved
# row max/denominator), accumulate dq/dk/dv without materializing [N,N].


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, m_ref, *,
                      scale: float, bk: int):
    q = q_ref[0].astype(jnp.float32) * scale
    nk = k_ref.shape[1]
    bq, d = q.shape
    num_kb = nk // bk

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    l_ref[0] = l[:, 0]
    m_ref[0] = m[:, 0]


def _flash_bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, l_ref, m_ref,
                      dq_ref, dk_ref, dv_ref, *, scale: float, bq: int):
    """One program per (batch, k-block); loops q blocks, accumulating dk/dv
    locally and dq via output accumulation (grid-order sum)."""
    k = k_ref[0].astype(jnp.float32)               # [BK, D]
    v = v_ref[0].astype(jnp.float32)               # [BK, D]
    nq = q_ref.shape[1]
    bk, d = k.shape
    num_qb = nq // bq

    # dq is accumulated across k-block grid steps into the same output
    # window — zero it on the first visit (Pallas outputs are uninitialized)
    @pl.when(pl.program_id(1) == 0)
    def _():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * bq, bq), :].astype(jnp.float32) * scale
        o = o_ref[0, pl.ds(i * bq, bq), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * bq, bq), :].astype(jnp.float32)
        l = l_ref[0, pl.ds(i * bq, bq)][:, None]
        m = m_ref[0, pl.ds(i * bq, bq)][:, None]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp(s - m) / l                     # softmax probs [BQ, BK]
        dv = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        delta = jnp.sum(do * o, axis=-1, keepdims=True)
        ds = p * (dp - delta)                      # [BQ, BK]
        dq_i = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) * scale
        dq_ref[0, pl.ds(i * bq, bq), :] += dq_i.astype(dq_ref.dtype)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    # dk accumulated w.r.t. scaled q; the extra `scale` belongs to s=qk^T
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_fwd(q, k, v, scale, block_q, block_k):
    b, nq, d = q.shape
    nk = k.shape[1]
    bq = min(block_q, nq)
    bk = min(block_k, nk)
    kernel = functools.partial(_flash_fwd_kernel, scale=scale, bk=bk)
    o, l, m = pl.pallas_call(
        kernel,
        grid=(b, nq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda ib, iq: (ib, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda ib, iq: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda ib, iq: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda ib, iq: (ib, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq), lambda ib, iq: (ib, iq),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq), lambda ib, iq: (ib, iq),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nq, d), q.dtype),
            jax.ShapeDtypeStruct((b, nq), jnp.float32),
            jax.ShapeDtypeStruct((b, nq), jnp.float32),
        ),
    )(q, k, v)
    return o, l, m


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_trainable(q, k, v, scale, block_q=DEFAULT_BQ,
                              block_k=DEFAULT_BK):
    """Flash attention with a Pallas backward (training path)."""
    o, _, _ = _flash_fwd(q, k, v, scale, block_q, block_k)
    return o


def _fa_fwd_rule(q, k, v, scale, block_q, block_k):
    o, l, m = _flash_fwd(q, k, v, scale, block_q, block_k)
    return o, (q, k, v, o, l, m)


def _fa_bwd_rule(scale, block_q, block_k, res, do):
    q, k, v, o, l, m = res
    b, nq, d = q.shape
    nk = k.shape[1]
    bq = min(block_q, nq)
    bk = min(block_k, nk)
    kernel = functools.partial(_flash_bwd_kernel, scale=scale, bq=bq)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, nk // bk),
        in_specs=[
            pl.BlockSpec((1, nq, d), lambda ib, ik: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda ib, ik: (ib, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda ib, ik: (ib, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, d), lambda ib, ik: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, d), lambda ib, ik: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq), lambda ib, ik: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq), lambda ib, ik: (ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, nq, d), lambda ib, ik: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda ib, ik: (ib, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda ib, ik: (ib, ik, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nq, d), q.dtype),
            jax.ShapeDtypeStruct((b, nk, d), k.dtype),
            jax.ShapeDtypeStruct((b, nk, d), v.dtype),
        ),
    )(q, k, v, o, do, l, m)
    return dq, dk, dv


flash_attention_trainable.defvjp(_fa_fwd_rule, _fa_bwd_rule)
