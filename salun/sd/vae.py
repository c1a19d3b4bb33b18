"""AutoencoderKL (the SD first stage) in flax.

Capability parity with SD/ldm/models/autoencoder.py:339-530 +
ldm/modules/diffusionmodules/model.py:379-627 (Encoder/Decoder) and the
diagonal-Gaussian posterior (ldm/modules/distributions/distributions.py:24-102),
for the sd-v1 config (ch 128, ch_mult [1,2,4,4], 2 res blocks, no attn in
the down path, double_z, z=4, f=8).

Used by LatentDiffusion.get_input (encode·0.18215) and image decoding
(ldm/models/diffusion/ddpm.py:913-973). Module names mirror the CompVis
state dict (``encoder/down_0_block_1/conv1``) for mechanical import.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from salun.kernels.attention import scaled_dot_attention


@dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    in_channels: int = 3
    out_channels: int = 3
    scale_factor: float = 0.18215   # v1-inference.yaml scale_factor
    dtype: jnp.dtype = jnp.float32


def _gn(x, name, dtype):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype,
                        param_dtype=jnp.float32, name=name)(x)


# NB: the fused GroupNormSiLU Pallas module is deliberately NOT wired in
# (measured ~20% step regression in context; docs/BENCHMARKS.md r2).


class VAEResnetBlock(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _gn(x, "norm1", self.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = _gn(h, "norm2", self.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head spatial attention (model.py AttnBlock)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = _gn(x, "norm", self.dtype)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(y).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(y).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(y).reshape(b, h * w, c)
        o = scaled_dot_attention(q, k, v, scale=c ** -0.5).reshape(b, h, w, c)
        return x + nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(o)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dt = c.dtype
        h = nn.Conv(c.ch, (3, 3), padding=1, dtype=dt, name="conv_in")(
            x.astype(dt))
        for level, mult in enumerate(c.ch_mult):
            ch = c.ch * mult
            for j in range(c.num_res_blocks):
                h = VAEResnetBlock(ch, dt, name=f"down_{level}_block_{j}")(h)
            if level != len(c.ch_mult) - 1:
                # asymmetric (0,1) pad + stride-2 VALID conv (model.py Downsample)
                hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=2, padding="VALID", dtype=dt,
                            name=f"down_{level}_downsample")(hp)
        h = VAEResnetBlock(h.shape[-1], dt, name="mid_block_1")(h)
        h = VAEAttnBlock(dt, name="mid_attn_1")(h)
        h = VAEResnetBlock(h.shape[-1], dt, name="mid_block_2")(h)
        h = _gn(h, "norm_out", dt)
        h = nn.silu(h)
        return nn.Conv(2 * c.z_channels, (3, 3), padding=1, dtype=jnp.float32,
                       name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        dt = c.dtype
        ch = c.ch * c.ch_mult[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=dt, name="conv_in")(
            z.astype(dt))
        h = VAEResnetBlock(ch, dt, name="mid_block_1")(h)
        h = VAEAttnBlock(dt, name="mid_attn_1")(h)
        h = VAEResnetBlock(ch, dt, name="mid_block_2")(h)
        for level in reversed(range(len(c.ch_mult))):
            ch = c.ch * c.ch_mult[level]
            for j in range(c.num_res_blocks + 1):
                h = VAEResnetBlock(ch, dt, name=f"up_{level}_block_{j}")(h)
            if level != 0:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, 2 * hh, 2 * ww, cc), "nearest")
                h = nn.Conv(cc, (3, 3), padding=1, dtype=dt,
                            name=f"up_{level}_upsample")(h)
        h = _gn(h, "norm_out", dt)
        h = nn.silu(h)
        return nn.Conv(c.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.quant_conv = nn.Conv(2 * self.cfg.embed_dim, (1, 1),
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1),
                                       name="post_quant_conv")

    def encode_moments(self, x):
        """x in [−1,1] NHWC → (mean, logvar) of the latent posterior."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_sample(self, x, key):
        """Posterior sample (DiagonalGaussianDistribution.sample)."""
        mean, logvar = self.encode_moments(x)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(key, mean.shape)

    def encode_mode(self, x):
        return self.encode_moments(x)[0]

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key):
        z = self.encode_sample(x, key)
        return self.decode(z), z
