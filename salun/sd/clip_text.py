"""CLIP text encoder (ViT-L/14 text tower) in flax.

Capability parity with ``FrozenCLIPEmbedder``
(SD/ldm/modules/encoders/modules.py:230-266): HF ``CLIPTextModel``
last_hidden_state over 77 BPE tokens — vocab 49408, width 768, 12 layers,
12 heads, quickGELU, causal mask, final LayerNorm. Weights import from the
CompVis checkpoint's ``cond_stage_model.transformer.*`` keys
(salun.sd.import_ckpt).

Tokenization is real byte-level BPE (salun.sd.tokenizer), loaded from
local assets (OpenAI merges file, HF vocab.json+merges.txt, or the HF
cache); :func:`tokenize` fails loudly when none are present — approximate
token ids would silently corrupt the conditioning of every SD run.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    dtype: jnp.dtype = jnp.float32


class CLIPMLP(nn.Module):
    hidden: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden * 4, dtype=self.dtype, name="fc1")(x)
        h = h * nn.sigmoid(1.702 * h)  # quickGELU
        return nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(h)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        d = c.hidden_size
        hd = d // c.num_heads
        q = nn.Dense(d, dtype=c.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=c.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=c.dtype, name="v_proj")(x)
        b, n, _ = x.shape

        def split(t):
            return t.reshape(b, n, c.num_heads, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) * hd**-0.5
        logits = logits + mask
        w = jnp.astype(nn.softmax(logits.astype(jnp.float32), axis=-1),
                       v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, split(v))
        o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
        return nn.Dense(d, dtype=c.dtype, name="out_proj")(o)


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        y = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(c, name="self_attn")(y, mask)
        y = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="layer_norm2")(x)
        x = x + CLIPMLP(c.hidden_size, c.dtype, name="mlp")(y)
        return x


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, input_ids):
        c = self.cfg
        n = input_ids.shape[1]
        tok = nn.Embed(c.vocab_size, c.hidden_size,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (c.max_length, c.hidden_size))
        x = tok + pos[None, :n]
        causal = jnp.triu(jnp.full((n, n), -1e9, jnp.float32), k=1)
        mask = causal[None, None]
        for i in range(c.num_layers):
            x = CLIPLayer(c, name=f"layers_{i}")(x, mask)
        # eps 1e-5: HF CLIPTextConfig.layer_norm_eps (flax default is
        # 1e-6 — a real mismatch caught by test_arch_parity)
        return nn.LayerNorm(epsilon=1e-5, dtype=c.dtype,
                            name="final_layer_norm")(x)


# ------------------------------------------------------------- tokenizer

_BOS, _EOS = 49406, 49407
_TOKENIZER = None


def get_tokenizer():
    """The real CLIP tokenizer (salun.sd.tokenizer assets). Raises
    FileNotFoundError when no assets are available."""
    global _TOKENIZER
    if _TOKENIZER is None:
        from salun.sd.tokenizer import load_clip_tokenizer

        _TOKENIZER = load_clip_tokenizer()
    return _TOKENIZER


def tokenize(texts, max_length: int = 77) -> np.ndarray:
    """texts → int32 [B, max_length] CLIP BPE ids (BOS/EOS, EOS-padded).

    Parity: FrozenCLIPEmbedder's tokenizer call with padding="max_length"
    (SD/ldm/modules/encoders/modules.py:234-238). No approximate fallback —
    fails loudly without tokenizer assets."""
    return np.asarray(get_tokenizer()(list(texts), max_length), np.int32)
