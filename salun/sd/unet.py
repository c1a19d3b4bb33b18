"""Stable-Diffusion U-Net (CompVis ``UNetModel``) in flax.

Capability parity with SD/ldm/modules/diffusionmodules/openaimodel.py:428-1064
for the sd-v1 configuration (SD/configs/stable-diffusion/v1-inference.yaml:
in/out 4ch latents, model_channels 320, channel_mult [1,2,4,4],
num_res_blocks 2, attention at ds∈{1,2,4}, 8 heads, SpatialTransformer depth
1 with 768-d CLIP context) plus the ResBlock / SpatialTransformer /
CrossAttention / GEGLU blocks (openaimodel.py:177-290,
ldm/modules/attention.py:37-303).

TPU-first:
- NHWC; attention via salun.kernels (Pallas flash attention when aligned) —
  no [N,N] score materialization. The reference's block-level gradient
  checkpointing (use_checkpoint: True, ldm/modules/diffusionmodules/
  util.py:124-171) is available as ``SDUNetConfig.remat`` (lifted
  nn.remat over ResBlock/SpatialTransformer; needed at the bs-8 training
  recipe on 16 GB chips).
- Module names mirror the CompVis state-dict layout
  (``input_blocks_4_1/transformer_blocks_0/attn2/to_k``) so checkpoint
  import (salun.sd.import_ckpt) is a mechanical rename.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from salun.kernels.attention import multi_head_attention


def openai_timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """OpenAI-UNet sinusoidal embedding: cos-first, ``/half`` frequency
    denominator (ldm/modules/diffusionmodules/util.py timestep_embedding) —
    NOT the DDPM variant (sin-first, ``/(half-1)``,
    DDPM/models/diffusion.py:17-35). The two disagree numerically; using
    the wrong one silently breaks imported sd-v1 checkpoints."""
    import math

    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


@dataclass(frozen=True)
class SDUNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # Rematerialize ResBlocks/SpatialTransformers in the backward pass —
    # the reference trains with exactly this (use_checkpoint: True,
    # v1-inference.yaml:43, ldm/modules/diffusionmodules/util.py:124-171).
    # Identical math, ~25% extra fwd FLOPs in bwd; required to fit the
    # bs-8 recipe (three trainable 859.5M-param passes + Adam state) in
    # 16 GB of v5e HBM.
    remat: bool = False


def _gn32(x, name, eps=1e-5, dtype=jnp.float32):
    return nn.GroupNorm(num_groups=32, epsilon=eps, dtype=dtype,
                        param_dtype=jnp.float32, name=name)(x)


# NB: the fused GroupNormSiLU Pallas module is deliberately NOT wired in
# (measured ~20% step regression in context; docs/BENCHMARKS.md r2).


class CrossAttention(nn.Module):
    """attention.py:149-194; context=None → self-attention."""

    heads: int
    dim_head: int
    query_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        context = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        out = multi_head_attention(q, k, v, self.heads,
                                   scale=self.dim_head ** -0.5)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)


class FeedForward(nn.Module):
    """GEGLU FF (attention.py:37-63)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        proj = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)  # torch F.gelu = exact erf
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        # eps 1e-5 = torch nn.LayerNorm default (flax defaults to 1e-6)
        ln = lambda n: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                    param_dtype=jnp.float32, name=n)
        x = CrossAttention(self.heads, self.dim_head, self.dim, self.dtype,
                           name="attn1")(ln("norm1")(x)) + x
        x = CrossAttention(self.heads, self.dim_head, self.dim, self.dtype,
                           name="attn2")(ln("norm2")(x), context) + x
        x = FeedForward(self.dim, dtype=self.dtype, name="ff")(
            ln("norm3")(x)) + x
        return x


class SpatialTransformer(nn.Module):
    """attention.py:246-303: GN → 1x1 in → blocks → 1x1 out (zero-init) + res."""

    channels: int
    heads: int
    dim_head: int
    depth: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        y = _gn32(x, "norm", eps=1e-6, dtype=self.dtype)
        y = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(y)
        y = y.reshape(b, h * w, inner)
        for d in range(self.depth):
            y = BasicTransformerBlock(
                inner, self.heads, self.dim_head, self.context_dim,
                self.dtype, name=f"transformer_blocks_{d}",
            )(y, context)
        y = y.reshape(b, h, w, inner)
        y = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="proj_out")(y)
        return x + y


class ResBlock(nn.Module):
    """openaimodel.py:177-290 (no scale-shift in sd-v1; out conv zero-init)."""

    out_ch: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, train: bool = False):
        h = _gn32(x, "in_layers_0", dtype=self.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="in_layers_2")(h)
        e = nn.Dense(self.out_ch, dtype=self.dtype, name="emb_layers_1")(
            nn.silu(emb))
        h = h + e[:, None, None, :]
        h = _gn32(h, "out_layers_0", dtype=self.dtype)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="out_layers_3")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="skip_connection")(x)
        return x + h


class Downsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(x.shape[-1], (3, 3), strides=2, padding=1,
                       dtype=self.dtype, name="op")(x)


class Upsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
        return nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class SDUNet(nn.Module):
    cfg: SDUNetConfig

    @nn.compact
    def __call__(self, x, t, context, train: bool = False):
        """x: NHWC latents; t: float timesteps; context: [B, L, 768]."""
        c = self.cfg
        dt = c.dtype
        time_dim = c.model_channels * 4

        emb = openai_timestep_embedding(t, c.model_channels)
        emb = nn.Dense(time_dim, dtype=dt, name="time_embed_0")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(time_dim, dtype=dt, name="time_embed_2")(emb)

        heads = c.num_heads

        # lifted remat preserves module names, so checkpoints are
        # layout-identical with remat on or off
        ResBlockM = (nn.remat(ResBlock, static_argnums=(3,)) if c.remat
                     else ResBlock)
        SpatialM = (nn.remat(SpatialTransformer) if c.remat
                    else SpatialTransformer)

        hs = []
        h = nn.Conv(c.model_channels, (3, 3), padding=1, dtype=dt,
                    name="input_blocks_0_0")(x.astype(dt))
        hs.append(h)

        ds = 1
        block_i = 1
        for level, mult in enumerate(c.channel_mult):
            ch = mult * c.model_channels
            for _ in range(c.num_res_blocks):
                h = ResBlockM(ch, c.dropout, dt,
                              name=f"input_blocks_{block_i}_0")(h, emb,
                                                                train)
                if ds in c.attention_resolutions:
                    h = SpatialM(
                        ch, heads, ch // heads, c.transformer_depth,
                        c.context_dim, dt, name=f"input_blocks_{block_i}_1",
                    )(h, context)
                hs.append(h)
                block_i += 1
            if level != len(c.channel_mult) - 1:
                h = Downsample(dt, name=f"input_blocks_{block_i}_0")(h)
                hs.append(h)
                block_i += 1
                ds *= 2

        ch = c.channel_mult[-1] * c.model_channels
        h = ResBlockM(ch, c.dropout, dt, name="middle_block_0")(h, emb,
                                                                train)
        h = SpatialM(ch, heads, ch // heads, c.transformer_depth,
                     c.context_dim, dt, name="middle_block_1")(h, context)
        h = ResBlockM(ch, c.dropout, dt, name="middle_block_2")(h, emb,
                                                                train)

        block_i = 0
        for level, mult in reversed(list(enumerate(c.channel_mult))):
            ch = mult * c.model_channels
            for j in range(c.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlockM(ch, c.dropout, dt,
                              name=f"output_blocks_{block_i}_0")(h, emb,
                                                                 train)
                sub = 1
                if ds in c.attention_resolutions:
                    h = SpatialM(
                        ch, heads, ch // heads, c.transformer_depth,
                        c.context_dim, dt,
                        name=f"output_blocks_{block_i}_1",
                    )(h, context)
                    sub = 2
                if level and j == c.num_res_blocks:
                    h = Upsample(dt, name=f"output_blocks_{block_i}_{sub}")(h)
                    ds //= 2
                block_i += 1

        h = _gn32(h, "out_0", dtype=dt)
        h = nn.silu(h)
        h = nn.Conv(c.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                    kernel_init=nn.initializers.zeros, name="out_2")(h)
        return h
