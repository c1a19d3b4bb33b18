"""Class-conditional CFG U-Net (DDPM) in flax.

Capability parity with ``Conditional_Model`` (DDPM/models/diffusion.py:195-413):
sinusoidal t-embedding → 2-layer MLP; class embedding + learned null
embedding with per-sample cond-drop; ResnetBlocks with GroupNorm(32, eps
1e-6)+SiLU and a concat(temb,cemb) projection; single-head spatial
self-attention at the configured resolutions; nearest-2x upsample conv /
asymmetric-pad stride-2 downsample conv; CFG test path
(1+s)·eps_c − s·eps_∅ (diffusion.py:340-355).

TPU-first design choices:
- NHWC layout; activations can run bfloat16 (params fp32).
- CFG at inference runs *one* forward on a doubled batch (cond+null
  stacked via ``keep_mask``) instead of the reference's two sequential
  forwards — better MXU utilization, weights stream from HBM once.
- Attention goes through salun.kernels (Pallas flash attention on TPU).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class UNetConfig:
    """Model block of the reference YAML (configs/cifar10_train.yml)."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.1
    in_channels: int = 3
    image_size: int = 32
    n_classes: int = 10
    cond_drop_prob: float = 0.1
    resamp_with_conv: bool = True
    dtype: jnp.dtype = jnp.float32


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal embedding (models/diffusion.py:17-35)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / (half - 1)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def group_norm(x, name: str, dtype=jnp.float32):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype,
                        param_dtype=jnp.float32, name=name)(x)


# NB: a fused GroupNorm→SiLU Pallas module exists
# (salun.kernels.groupnorm_silu.GroupNormSiLU, checkpoint-compatible) but
# is NOT wired in: measured end-to-end on v5e it costs ~20% of the DDPM
# unlearn step — the kernel boundary defeats XLA's fusion of the
# normalize+silu tail into neighboring ops (docs/BENCHMARKS.md r2).


class ResnetBlock(nn.Module):
    out_ch: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, train: bool):
        h = group_norm(x, "norm1", self.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        # concat(temb,cemb) projection added per-channel (diffusion.py:126-131)
        proj = nn.Dense(self.out_ch, dtype=self.dtype, name="temb_cemb_proj")(
            nn.silu(emb)
        )
        h = h + proj[:, None, None, :]
        h = group_norm(h, "norm2", self.dtype)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over H·W tokens
    (diffusion.py:148-192)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = group_norm(x, "norm", self.dtype)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(y).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(y).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(y).reshape(b, h * w, c)

        from salun.kernels import attention as attn_kernel

        out = attn_kernel.scaled_dot_attention(q, k, v, scale=c ** -0.5)
        out = out.reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            # asymmetric (0,1)x(0,1) pad + stride-2 valid conv
            # (diffusion.py:66-81)
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(x.shape[-1], (3, 3), strides=2, padding="VALID",
                           dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        if self.with_conv:
            x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        return x


class ConditionalUNet(nn.Module):
    """CFG-conditional eps-prediction U-Net."""

    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, t, c, *, train: bool = False,
                 cond_drop_prob: Optional[float] = None,
                 keep_mask: Optional[jnp.ndarray] = None):
        """x NHWC in [−1,1]; t float timesteps; c int class labels.

        Conditioning is dropped per sample with prob ``cond_drop_prob``
        (needs the 'cond_drop' RNG), or explicitly via a boolean
        ``keep_mask`` (True = keep class embedding) — the latter is how the
        batched CFG path forces cond/null halves deterministically.
        """
        cfgm = self.cfg
        dt = cfgm.dtype
        cond_drop_prob = (
            cfgm.cond_drop_prob if cond_drop_prob is None else cond_drop_prob
        )

        temb = timestep_embedding(t, cfgm.ch)
        temb = nn.Dense(cfgm.ch * 4, dtype=dt, name="temb_dense0")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(cfgm.ch * 4, dtype=dt, name="temb_dense1")(temb)

        cemb = nn.Embed(cfgm.n_classes, cfgm.ch, name="classes_emb")(c)
        null_emb = self.param(
            "null_classes_emb", nn.initializers.normal(1.0), (cfgm.ch,)
        )
        if keep_mask is None:
            if cond_drop_prob >= 1.0:
                keep_mask = jnp.zeros((x.shape[0],), bool)
            elif cond_drop_prob <= 0.0:
                keep_mask = jnp.ones((x.shape[0],), bool)
            else:
                key = self.make_rng("cond_drop")
                keep_mask = jax.random.bernoulli(
                    key, 1.0 - cond_drop_prob, (x.shape[0],)
                )
        cemb = jnp.where(keep_mask[:, None], cemb, null_emb[None, :])
        cemb = nn.Dense(cfgm.ch * 4, dtype=dt, name="cemb_dense0")(cemb)
        cemb = nn.silu(cemb)
        cemb = nn.Dense(cfgm.ch * 4, dtype=dt, name="cemb_dense1")(cemb)

        emb = jnp.concatenate([temb, cemb], axis=-1)

        num_res = len(cfgm.ch_mult)
        curr_res = cfgm.image_size
        hs = [nn.Conv(cfgm.ch, (3, 3), padding=1, dtype=dt, name="conv_in")(
            x.astype(dt))]
        for i_level in range(num_res):
            for i_block in range(cfgm.num_res_blocks):
                h = ResnetBlock(cfgm.ch * cfgm.ch_mult[i_level], cfgm.dropout,
                                dt, name=f"down_{i_level}_block_{i_block}")(
                    hs[-1], emb, train)
                if curr_res in cfgm.attn_resolutions:
                    h = AttnBlock(dt, name=f"down_{i_level}_attn_{i_block}")(h)
                hs.append(h)
            if i_level != num_res - 1:
                hs.append(Downsample(cfgm.resamp_with_conv, dt,
                                     name=f"down_{i_level}_downsample")(hs[-1]))
                curr_res //= 2

        h = hs[-1]
        h = ResnetBlock(h.shape[-1], cfgm.dropout, dt, name="mid_block_1")(
            h, emb, train)
        h = AttnBlock(dt, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], cfgm.dropout, dt, name="mid_block_2")(
            h, emb, train)

        for i_level in reversed(range(num_res)):
            for i_block in range(cfgm.num_res_blocks + 1):
                h = ResnetBlock(cfgm.ch * cfgm.ch_mult[i_level], cfgm.dropout,
                                dt, name=f"up_{i_level}_block_{i_block}")(
                    jnp.concatenate([h, hs.pop()], axis=-1), emb, train)
                if curr_res in cfgm.attn_resolutions:
                    h = AttnBlock(dt, name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(cfgm.resamp_with_conv, dt,
                             name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        h = group_norm(h, "norm_out", dt)
        h = nn.silu(h)
        h = nn.Conv(cfgm.out_ch, (3, 3), padding=1, dtype=jnp.float32,
                    name="conv_out")(h)
        return h


def cfg_eps(model: ConditionalUNet, variables, x, t, c, cond_scale: float):
    """Classifier-free-guided eps: (1+s)·eps_c − s·eps_∅
    (diffusion.py:340-355), as ONE forward on a stacked 2B batch."""
    if cond_scale == 0.0:
        return model.apply(variables, x, t, c, train=False, cond_drop_prob=0.0)
    b = x.shape[0]
    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    c2 = jnp.concatenate([c, c], axis=0)
    keep = jnp.arange(2 * b) < b
    eps2 = model.apply(variables, x2, t2, c2, train=False, keep_mask=keep)
    eps_c, eps_null = eps2[:b], eps2[b:]
    return (1.0 + cond_scale) * eps_c - cond_scale * eps_null
