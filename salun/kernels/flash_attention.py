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

# Autotuned on v5e (scripts/autotune_flash.py, scan-based timing): the
# (512, 1024) tile wins every 4096-seq shape swept (d ∈ {40, 64, 128},
# B ∈ {8, 16, 32}) at 2.1–2.8× XLA fwd+bwd; larger tiles plateau and
# bq=1024×bk=4096 fails Mosaic compile. Shorter sequences clamp to N.
DEFAULT_BQ = 512
DEFAULT_BK = 1024
_NEG_INF = -1e30  # avoids -inf NaN traps in exp(m_prev - m_new) on step 0


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_s, m_s, l_s, *,
                  scale: float, num_kb: int, emit_lm: bool,
                  l_ref=None, m_ref=None):
    """One (q-block, k-block) tile per program; the k-block axis is the
    LAST grid dimension, so Mosaic revisits the same output window with the
    fp32 running state (acc, row-max, denominator) held in VMEM scratch and
    pipelines the K/V block DMAs (the canonical TPU flash structure —
    fori_loop-with-carry versions defeat the pipeliner and measured 80×
    slower than XLA on v5e)."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, _NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    # native-dtype MXU operands (bf16 inputs run the matrix units at bf16
    # throughput) with fp32 accumulation; the scale folds in afterwards in
    # fp32 — linear, so numerics match XLA's bf16-einsum + fp32 softmax.
    q = q_ref[0]                                        # [BQ, D]
    k = k_ref[0]                                        # [BK, D]
    v = v_ref[0]                                        # [BK, D]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale

    # scratch m/l are (BQ, 128) lane-replicated; recover (BQ, 1) by max.
    m_prev = jnp.max(m_s[:], axis=-1, keepdims=True)
    l_prev = jnp.max(l_s[:], axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)                              # [BQ, BK]
    alpha = jnp.exp(m_prev - m_new)                     # [BQ, 1]
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_s[:] = acc_s[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_s[:] = jnp.broadcast_to(m_new, m_s.shape)
    l_s[:] = jnp.broadcast_to(l_new, l_s.shape)

    @pl.when(ik == num_kb - 1)
    def _finish():
        l_fin = jnp.max(l_s[:], axis=-1, keepdims=True)
        o_ref[0] = (acc_s[:] / l_fin).astype(o_ref.dtype)
        if emit_lm:
            # stats saved as [B, Nq, 1] so the backward reads columns
            l_ref[0] = l_fin
            m_ref[0] = jnp.max(m_s[:], axis=-1, keepdims=True)


def _flash_call(q, k, v, scale, block_q, block_k, emit_lm):
    b, nq, d = q.shape
    nk = k.shape[1]
    bq = min(block_q, nq)
    bk = min(block_k, nk)
    assert nq % bq == 0 and nk % bk == 0, (nq, nk, bq, bk)
    num_kb = nk // bk

    if emit_lm:
        kernel = functools.partial(
            _kernel_with_lm, scale=scale, num_kb=num_kb)
    else:
        kernel = functools.partial(_flash_kernel, scale=scale,
                                   num_kb=num_kb, emit_lm=False)
    out_shape = [jax.ShapeDtypeStruct((b, nq, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, bq, d), lambda ib, iq, ik: (ib, iq, 0),
                              memory_space=pltpu.VMEM)]
    if emit_lm:
        out_shape += [jax.ShapeDtypeStruct((b, nq, 1), jnp.float32),
                      jax.ShapeDtypeStruct((b, nq, 1), jnp.float32)]
        out_specs += [pl.BlockSpec((1, bq, 1), lambda ib, iq, ik: (ib, iq, 0),
                                   memory_space=pltpu.VMEM)] * 2

    outs = pl.pallas_call(
        kernel,
        grid=(b, nq // bq, num_kb),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda ib, iq, ik: (ib, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda ib, iq, ik: (ib, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda ib, iq, ik: (ib, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs) if emit_lm else out_specs[0],
        out_shape=tuple(out_shape) if emit_lm else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),     # acc
            pltpu.VMEM((bq, 128), jnp.float32),   # running row max
            pltpu.VMEM((bq, 128), jnp.float32),   # running denominator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nq * nk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize * 2,
            transcendentals=b * nq * nk,
        ),
    )(q, k, v)
    return outs


def _kernel_with_lm(q_ref, k_ref, v_ref, o_ref, l_ref, m_ref,
                    acc_s, m_s, l_s, *, scale, num_kb):
    _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_s, m_s, l_s,
                  scale=scale, num_kb=num_kb, emit_lm=True,
                  l_ref=l_ref, m_ref=m_ref)


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, scale: float,
    block_q: int = DEFAULT_BQ, block_k: int = DEFAULT_BK,
) -> jnp.ndarray:
    """softmax(q·kᵀ·scale)·v with O(N) memory. Shapes [B, N, D]."""
    return _flash_call(q, k, v, scale, block_q, block_k, emit_lm=False)


# ----------------------------------------------------------------- backward
# Standard flash-attention backward: recompute P blockwise from (q, k, saved
# row max/denominator), accumulate dq/dk/dv without materializing [N,N].


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, dq_s, *, scale: float, num_kb: int):
    """Grid (b, q-blocks, k-blocks); dq accumulates in VMEM scratch across
    the (last) k-block axis and is written on its final step."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        dq_s[:] = jnp.zeros_like(dq_s)

    q = q_ref[0]                                    # [BQ, D]
    k = k_ref[0]                                    # [BK, D]
    v = v_ref[0]
    do = do_ref[0]                                  # [BQ, D]
    lse, delta = lse_ref[0], delta_ref[0]           # [BQ, 1]

    # native-dtype MXU dots, fp32 accumulation (see forward kernel)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)                            # [BQ, BK]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(q.dtype)
    dq_s[:] = dq_s[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == num_kb - 1)
    def _finish():
        dq_ref[0] = (dq_s[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_s, dv_s, *, scale: float,
                    num_qb: int):
    """Grid (b, k-blocks, q-blocks); dk/dv accumulate in scratch across the
    (last) q-block axis."""
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _():
        dk_s[:] = jnp.zeros_like(dk_s)
        dv_s[:] = jnp.zeros_like(dv_s)

    q = q_ref[0]                                    # [BQ, D]
    k = k_ref[0]                                    # [BK, D]
    v = v_ref[0]
    do = do_ref[0]
    lse, delta = lse_ref[0], delta_ref[0]           # [BQ, 1]

    # native-dtype MXU dots, fp32 accumulation (see forward kernel)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)                            # [BQ, BK]
    dv_s[:] = dv_s[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(q.dtype)
    dk_s[:] = dk_s[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(iq == num_qb - 1)
    def _finish():
        # dk = scale · dsᵀ q (the scale folds in once here)
        dk_ref[0] = (dk_s[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_s[:].astype(dv_ref.dtype)


def _flash_fwd(q, k, v, scale, block_q, block_k):
    return _flash_call(q, k, v, scale, block_q, block_k, emit_lm=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_trainable(q, k, v, scale, block_q=DEFAULT_BQ,
                              block_k=DEFAULT_BK):
    """Flash attention with a Pallas backward (training path)."""
    o, _, _ = _flash_fwd(q, k, v, scale, block_q, block_k)
    return o


def _fa_fwd_rule(q, k, v, scale, block_q, block_k):
    o, l, m = _flash_fwd(q, k, v, scale, block_q, block_k)
    # Save ONE compact [B, Nq] residual: lse = m + log l. The kernel's
    # [B, Nq, 1] f32 stats pad the trailing dim to 128 lanes in HBM
    # (128× — e.g. 128 MB instead of 1 MB per 4096-seq site, measured
    # ~1.3 GB of pure padding in the SD U-Net's residuals at bs 2), and a
    # plain squeeze lowers to a BITCAST that keeps the padded buffer
    # alive — the log-add is real arithmetic, so XLA writes a fresh
    # compact buffer. The backward recovers p = exp(s·scale − lse)
    # (identical up to one fp32 log/exp roundtrip, ~1e-7 relative).
    lse = m[..., 0] + jnp.log(l[..., 0])
    return o, (q, k, v, o, lse)


def _fa_bwd_rule(scale, block_q, block_k, res, do):
    q, k, v, o, lse = res
    # per-kernel transient re-expansion to the padded [B, Nq, 1] operand
    # layout (one site at a time — peak-neutral)
    lse = lse[..., None]
    b, nq, d = q.shape
    nk = k.shape[1]
    bq = min(block_q, nq)
    bk = min(block_k, nk)
    num_qb, num_kb = nq // bq, nk // bk
    # delta_i = Σ_d do·o per query row (precomputed in XLA, one cheap pass)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)

    def spec_q(last):
        return pl.BlockSpec((1, bq, last), lambda ib, iq, ik: (ib, iq, 0),
                            memory_space=pltpu.VMEM)

    def spec_k(last):
        return pl.BlockSpec((1, bk, last), lambda ib, iq, ik: (ib, ik, 0),
                            memory_space=pltpu.VMEM)

    # swap grid roles for the dkv kernel: dim1 = k-block, dim2 = q-block
    def spec_q2(last):
        return pl.BlockSpec((1, bq, last), lambda ib, ik, iq: (ib, iq, 0),
                            memory_space=pltpu.VMEM)

    def spec_k2(last):
        return pl.BlockSpec((1, bk, last), lambda ib, ik, iq: (ib, ik, 0),
                            memory_space=pltpu.VMEM)

    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"))
    cost = pl.CostEstimate(
        flops=5 * b * nq * nk * d,
        bytes_accessed=(q.size * 4 + k.size * 2 + v.size * 2) *
        q.dtype.itemsize,
        transcendentals=b * nq * nk,
    )

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, num_kb=num_kb),
        grid=(b, num_qb, num_kb),
        in_specs=[spec_q(d), spec_k(d), spec_k(d), spec_q(d),
                  spec_q(1), spec_q(1)],
        out_specs=spec_q(d),
        out_shape=jax.ShapeDtypeStruct((b, nq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=params,
        cost_estimate=cost,
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, num_qb=num_qb),
        grid=(b, num_kb, num_qb),
        in_specs=[spec_q2(d), spec_k2(d), spec_k2(d), spec_q2(d),
                  spec_q2(1), spec_q2(1)],
        out_specs=(spec_k2(d), spec_k2(d)),
        out_shape=(jax.ShapeDtypeStruct((b, nk, d), k.dtype),
                   jax.ShapeDtypeStruct((b, nk, d), v.dtype)),
        scratch_shapes=[pltpu.VMEM((bk, d), jnp.float32),
                        pltpu.VMEM((bk, d), jnp.float32)],
        compiler_params=params,
        cost_estimate=cost,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


flash_attention_trainable.defvjp(_fa_fwd_rule, _fa_bwd_rule)
