"""Attention kernels.

``scaled_dot_attention`` is the framework-wide attention entry point used by
the DDPM AttnBlock (reference DDPM/models/diffusion.py:148-192), the SD
CrossAttention (SD/ldm/modules/attention.py:149-194), and the OpenAI-UNet
QKV attention. On TPU it dispatches to a Pallas flash-attention kernel
(blockwise online-softmax, O(N) memory — replaces the reference's
checkpointed attention, SURVEY.md §5.7); elsewhere it falls back to the
fused XLA einsum path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, scale: float, context=None):
    """Reference path: softmax(q·kᵀ·scale)·v, fp32 softmax."""
    logits = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkc->bqc", w, v)


def scaled_dot_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, scale: Optional[float] = None,
) -> jnp.ndarray:
    """Single-head attention over [B, N, C] tensors.

    Dispatches to the Pallas flash kernel on TPU when shapes are tile-
    aligned; XLA fallback otherwise (CPU tests, ragged shapes).
    """
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    if _use_flash(q, k):
        from .flash_attention import flash_attention_trainable

        # the custom-VJP variant: identical forward, Pallas backward —
        # safe inside both inference and training graphs
        return flash_attention_trainable(q, k, v, scale)
    return _xla_attention(q, k, v, scale)


# Measured on TPU v5e with in-graph scan timing (scripts/autotune_flash.py
# — python-loop timing is untrustworthy on the axon remote backend): with
# the autotuned (512, 1024) tile, flash wins fwd+bwd 2.1–2.8× at seq 4096
# (SD 64×64 self-attention) and 1.2–2.0× at seq 1024 (SD 32×32), while
# removing the O(N²) logits buffer; at seq 256 (SD 16×16, DDPM res16) XLA
# is equal-or-faster (0.6–1.0×). Dispatch accordingly.
_FLASH_MIN_SEQ = 1024


def _use_flash(q, k) -> bool:
    import os

    if os.environ.get("SALUN_DISABLE_FLASH"):
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        return False
    b, nq, c = q.shape
    nk = k.shape[1]
    if min(nq, nk) < _FLASH_MIN_SEQ and not os.environ.get(
            "SALUN_FORCE_FLASH"):
        return False
    from .flash_attention import DEFAULT_BK, DEFAULT_BQ

    # blocks clamp to the sequence length, so the grid only tiles evenly
    # when N is a multiple of the (clamped) block
    return (nq % min(DEFAULT_BQ, nq) == 0 and nk % min(DEFAULT_BK, nk) == 0
            and nq % 128 == 0 and nk % 128 == 0 and c % 8 == 0)


def multi_head_attention(q, k, v, num_heads: int, *, scale=None):
    """[B, N, H*D] → heads folded into batch → single-head kernel → unfold."""
    b, nq, hd = q.shape
    d = hd // num_heads
    nk = k.shape[1]

    def fold(x, n):
        return (x.reshape(b, n, num_heads, d)
                 .transpose(0, 2, 1, 3)
                 .reshape(b * num_heads, n, d))

    out = scaled_dot_attention(
        fold(q, nq), fold(k, nk), fold(v, nk),
        scale=scale if scale is not None else d ** -0.5,
    )
    return (out.reshape(b, num_heads, nq, d)
               .transpose(0, 2, 1, 3)
               .reshape(b, nq, hd))
