"""Diffusion training losses.

Parity with DDPM/functions/losses.py:4-46: eps-prediction MSE summed over
pixel dims, meaned over batch; conditional variant with per-sample
cond-drop. ``loss_registry_conditional["simple"]`` equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule, q_sample


def noise_estimation_loss(model, variables, schedule: DiffusionSchedule,
                          x0, t, e, keepdim: bool = False):
    """Unconditional eps-MSE (losses.py:4-18)."""
    x = q_sample(x0, t, e, schedule)
    out = model.apply(variables, x, t.astype(jnp.float32), train=False)
    sq = jnp.square(e - out).sum(axis=(1, 2, 3))
    return sq if keepdim else sq.mean()


def noise_estimation_loss_conditional(
    model, variables, schedule: DiffusionSchedule, x0, t, c, e,
    *, cond_drop_prob: float = 0.1, rng=None, train: bool = False,
    keepdim: bool = False,
):
    """Conditional eps-MSE with cond-drop (losses.py:21-37)."""
    x = q_sample(x0, t, e, schedule)
    rngs = {}
    if cond_drop_prob and 0.0 < cond_drop_prob < 1.0:
        rngs["cond_drop"] = rng
    if train:
        rng_d = jax.random.fold_in(rng, 1)
        rngs["dropout"] = rng_d
    out = model.apply(
        variables, x, t.astype(jnp.float32), c, train=train,
        cond_drop_prob=cond_drop_prob, rngs=rngs or None,
    )
    sq = jnp.square(e - out).sum(axis=(1, 2, 3))
    return sq if keepdim else sq.mean()


loss_registry = {"simple": noise_estimation_loss}
loss_registry_conditional = {"simple": noise_estimation_loss_conditional}
