"""Exponential moving average of parameters.

Parity with DDPM/models/ema.py:5-51 (EMAHelper: shadow = (1−μ)·θ + μ·shadow,
ema_copy reconstruction). Here the shadow is just a param pytree updated by
one fused tree_map under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from functools import partial


def ema_init(params):
    return jax.tree.map(jnp.copy, params)


@partial(jax.jit, donate_argnums=1, static_argnums=2)
def ema_update(params, shadow, mu: float = 0.999):
    """shadow ← (1−μ)·θ + μ·shadow (ema.py:17-24)."""
    return jax.tree.map(lambda p, s: (1.0 - mu) * p + mu * s, params, shadow)


def ema_copy(shadow):
    """Stand-in for EMAHelper.ema_copy (ema.py:33-45): the shadow pytree IS
    the usable parameter set — no module reconstruction needed."""
    return jax.tree.map(jnp.copy, shadow)
