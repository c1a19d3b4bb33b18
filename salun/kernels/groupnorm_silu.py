"""Fused GroupNorm+SiLU Pallas kernel.

Every ResNet/U-Net block in the diffusion models does GroupNorm → SiLU →
conv (DDPM models/diffusion.py:42-46 Normalize + nonlinearity; SD
openaimodel/vae the same). XLA fuses most of this already; this kernel
guarantees a single HBM round-trip for the norm+activation pair on TPU and
serves as the template for further epilogue fusion.

Grid: one program per (batch row). The channel axis is the last (NHWC);
groups are contiguous channel slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int,
                    eps: float):
    """Group statistics via a [C, G] indicator matmul — Mosaic supports no
    reshape that splits the 128-lane channel axis, but a C×G matmul reduces
    over channel groups on the MXU and its transpose broadcasts back."""
    x = x_ref[0].astype(jnp.float32)           # [H, W, C]
    h, w, c = x.shape
    gc = c // groups
    x2 = x.reshape(h * w, c)                   # leading dims only: supported

    # indicator M[c, g] = 1 iff channel c belongs to group g
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    g_idx = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    M = (c_idx // gc == g_idx).astype(jnp.float32)

    n = h * w * gc
    ch_sum = jnp.sum(x2, axis=0, keepdims=True)          # [1, C]
    ch_sq = jnp.sum(x2 * x2, axis=0, keepdims=True)      # [1, C]
    hp = jax.lax.Precision.HIGHEST  # stats need full fp32, not bf16 MXU passes
    g_sum = jnp.dot(ch_sum, M, preferred_element_type=jnp.float32,
                    precision=hp)                                    # [1, G]
    g_sq = jnp.dot(ch_sq, M, preferred_element_type=jnp.float32,
                   precision=hp)                                     # [1, G]
    mean_g = g_sum / n
    var_g = g_sq / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast per-group stats back to channels: [1, G] @ Mᵀ → [1, C]
    mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32,
                     precision=hp)
    inv_c = jnp.dot(inv_g, M.T, preferred_element_type=jnp.float32,
                    precision=hp)

    y = (x2 - mean_c) * inv_c * scale_ref[:] + bias_ref[:]
    y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.reshape(h, w, c).astype(o_ref.dtype)


# One grid program holds ~4 fp32 copies of an [H, W, C] row (input, the
# flattened working copy, the normalized output, and the out block) on the
# 16 MB VMEM stack — rows beyond ~1M elements (e.g. SD's 64×64×320) OOM
# Mosaic's scoped allocation, so fall back to XLA there.
_MAX_ROW_ELEMS = 1_000_000


def groupnorm_silu(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   *, groups: int = 32, eps: float = 1e-6) -> jnp.ndarray:
    """Fused y = silu(groupnorm(x)·scale + bias), x NHWC."""
    b, h, w, c = x.shape
    if h * w * c > _MAX_ROW_ELEMS:
        return groupnorm_silu_reference(x, scale, bias, groups=groups,
                                        eps=eps)
    kernel = functools.partial(_gn_silu_kernel, groups=groups, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, scale, bias)


def groupnorm_silu_reference(x, scale, bias, *, groups=32, eps=1e-6):
    """XLA reference for testing."""
    b, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    norm = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    y = norm * scale + bias
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)
