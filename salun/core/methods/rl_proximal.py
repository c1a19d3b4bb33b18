"""RL_proximal — the mask-free SalUn variant.

Parity with Classification/unlearn/RL_pro.py:8-158: RL-style training, but
after every optimizer step all parameters are soft-thresholded toward their
initial values θ_init: with d = θ − θ_init and τ the ``ratio``-th smallest
|d| (ratio decays linearly over total steps, RL_pro.py:53-56),

    θ ← θ_init            where |d| ≤ τ
    θ ← θ − sign(d)·τ     otherwise

TPU design: the reference concatenates every parameter on the host and runs
``torch.topk`` per step (RL_pro.py:54-62). Here the threshold is the exact
bisection kth-value over the parameter pytree (salun.dist.topk) and the
shrink is a fused tree_map — no concatenation, all under jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from salun.core.train import TrainState, make_train_step
from salun.dist.topk import kth_largest_threshold
from salun.utils.tree import tree_size

from .common import (
    UnlearnConfig, make_unlearn_optimizer, reset_opt_state, snapshot_params,
)
from .iterative import _relabel_concat_loader


@partial(jax.jit, donate_argnums=0)
def _proximal_shrink(params, theta_init, ratio):
    """Soft-threshold toward theta_init with τ = ratio-th smallest |d|."""
    diffs = jax.tree.map(lambda p, t0: (p - t0).astype(jnp.float32),
                         params, theta_init)
    # ratio-th smallest == (n - ratio + 1)-th largest
    n = tree_size(diffs)
    k_largest = jnp.maximum(n - ratio + 1, 1)
    tau = kth_largest_threshold(jax.tree.map(jnp.abs, diffs), k_largest)

    def shrink(p, t0, d):
        moved = p.astype(jnp.float32) - jnp.sign(d) * tau
        out = jnp.where(jnp.abs(d) > tau, moved, t0.astype(jnp.float32))
        return out.astype(p.dtype)

    return jax.tree.map(shrink, params, theta_init, diffs)


def RL_proximal(loaders, model, state: TrainState, cfg: UnlearnConfig,
                mask=None, key=None):
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    theta_init = snapshot_params(state)
    n_params = tree_size(state.params)
    steps_per_epoch = len(loaders["forget"]) + len(loaders["retain"])
    total_steps = cfg.unlearn_epochs * steps_per_epoch

    tx = make_unlearn_optimizer(cfg, steps_per_epoch)
    state = reset_opt_state(state, tx)

    def ratio_at(step_count):
        # RL_pro.py:53: linearly decaying fraction of params pinned
        frac = (total_steps - (step_count + 1)) / total_steps
        return jnp.maximum((cfg.mask_ratio * frac * n_params).astype(jnp.int32), 1)

    if cfg.dataset in ("cifar10", "cifar100", "TinyImagenet"):
        step = make_train_step(model, tx, num_classes=cfg.num_classes)
        count = 0
        for epoch in range(cfg.unlearn_epochs):
            loader = _relabel_concat_loader(loaders, cfg, epoch)
            for batch in loader:
                key, sub = jax.random.split(key)
                state, _ = step(state, jax.tree.map(jnp.asarray, batch), sub)
                state = state.replace(params=_proximal_shrink(
                    state.params, theta_init,
                    ratio_at(jnp.asarray(epoch * steps_per_epoch, jnp.float32)),
                ))
                count += 1
    else:  # svhn path (RL_pro.py:85-158)
        forget_step = make_train_step(model, tx, random_labels=True,
                                      num_classes=cfg.num_classes)
        retain_step = make_train_step(model, tx, num_classes=cfg.num_classes)
        for epoch in range(cfg.unlearn_epochs):
            for batch in loaders["forget"]:
                key, sub = jax.random.split(key)
                state, _ = forget_step(state, jax.tree.map(jnp.asarray, batch), sub)
                state = state.replace(params=_proximal_shrink(
                    state.params, theta_init,
                    ratio_at(jnp.asarray(epoch * steps_per_epoch, jnp.float32)),
                ))
            for i, batch in enumerate(loaders["retain"]):
                key, sub = jax.random.split(key)
                state, _ = retain_step(state, jax.tree.map(jnp.asarray, batch), sub)
                state = state.replace(params=_proximal_shrink(
                    state.params, theta_init,
                    ratio_at(jnp.asarray(epoch * steps_per_epoch + i, jnp.float32)),
                ))
    return state
