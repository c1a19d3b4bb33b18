"""Prune-interleaved unlearning: FT_prune, FT_prune_bi, GA_prune, GA_prune_bi.

Parity:
- FT_prune (unlearn/FT_prune.py:9-22): FT_l1 then a sparsity check — the
  "l1-sparse" baseline.
- FT_prune_bi (unlearn/FT_prune_bi.py:9-29): every ``prune_step`` epochs
  apply global L1 (or random) pruning at a per-round rate
  1−(1−rate)^(1/((E−1)//ps+1)), interleaved with FT epochs.
- GA_prune (unlearn/GA_prune.py:67-209): IMP-style loop — GA training
  epochs, validate, prune, optional weight rewind.
- GA_prune_bi (unlearn/GA_prune_bi.py): GA epochs interleaved with pruning,
  like FT_prune_bi.

Design: the prune mask is explicit state; each train step applies it to the
params inside the loss (so grads of pruned weights vanish by chain rule,
like torch's weight_orig·mask reparameterization) and the step's gradient
masking keeps momentum out of pruned coords.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from salun.core import pruner
from salun.core.train import TrainState, cross_entropy
from salun.data.loader import augment, to_float

from .common import (
    UnlearnConfig, make_unlearn_optimizer, reset_opt_state, snapshot_params,
)
from .iterative import FT_l1


def make_pruned_train_step(model, tx, *, loss_sign=1.0, use_augment=True):
    """Train step with the prune mask applied to params inside the loss."""

    @partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch, prune_mask, key):
        img = to_float(batch["image"])
        if use_augment:
            img = augment(key, img)

        def loss_fn(params):
            eff = pruner.apply_prune_mask(params, prune_mask)
            out, mutated = model.apply(
                {"params": eff, "batch_stats": state.batch_stats},
                img, train=True, mutable=["batch_stats"],
            )
            return loss_sign * cross_entropy(
                out, batch["label"], batch.get("weight")
            ), mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=new_params, batch_stats=new_bs, opt_state=new_opt,
            step=state.step + 1,
        ), loss

    return step


def _bi_round_rate(cfg: UnlearnConfig, prune_step: int = 2) -> float:
    """Per-round prune rate (FT_prune_bi.py:15-17)."""
    rounds = (cfg.unlearn_epochs - 1) // prune_step + 1
    return 1.0 - (1.0 - cfg.rate) ** (1.0 / rounds)


def _prune_bi(loader_name: str, loss_sign: float):
    def method(loaders, model, state: TrainState, cfg: UnlearnConfig,
               mask=None, key=None):
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        loader = loaders[loader_name]
        prune_step = 2  # module constant in FT_prune_bi.py:6
        rate = _bi_round_rate(cfg, prune_step)
        tx = make_unlearn_optimizer(cfg, len(loader))
        state = reset_opt_state(state, tx)
        step = make_pruned_train_step(model, tx, loss_sign=loss_sign)
        prune_mask = pruner.ones_mask(state.params)
        for epoch in range(cfg.unlearn_epochs):
            if (cfg.unlearn_epochs - epoch) % prune_step == 0:
                if cfg.random_prune:
                    key, pk = jax.random.split(key)
                    prune_mask = pruner.global_random_prune(
                        state.params, rate, pk, prune_mask
                    )
                else:
                    prune_mask = pruner.global_l1_prune(
                        state.params, rate, prune_mask
                    )
            for batch in loader:
                key, sub = jax.random.split(key)
                state, _ = step(state, jax.tree.map(jnp.asarray, batch),
                                prune_mask, sub)
        # bake the mask into the weights (torch remove_prune equivalent)
        return state.replace(
            params=pruner.apply_prune_mask(state.params, prune_mask)
        )

    return method


FT_prune_bi = _prune_bi("retain", loss_sign=1.0)
GA_prune_bi = _prune_bi("forget", loss_sign=-1.0)


def FT_prune(loaders, model, state: TrainState, cfg: UnlearnConfig,
             mask=None, key=None):
    """FT_l1 then sparsity check (FT_prune.py:9-22)."""
    state = FT_l1(loaders, model, state, cfg, mask, key)
    zero_frac = _natural_sparsity(state.params)
    print(f"FT_prune: natural conv sparsity after l1 FT: {zero_frac:.2f}% zeros")
    return state


def _natural_sparsity(params) -> float:
    zeros = total = 0.0
    for p in jax.tree.leaves(params):
        if pruner.is_conv_kernel(p):
            zeros += float(jnp.sum(p == 0))
            total += p.size
    return 100.0 * zeros / max(total, 1.0)


def GA_prune(loaders, model, state: TrainState, cfg: UnlearnConfig,
             mask=None, key=None, pruning_times: int = 1,
             rewind: bool = True):
    """IMP loop with GA as the inner trainer (GA_prune.py:67-209)."""
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    loader = loaders["forget"]
    prune_mask = pruner.ones_mask(state.params)
    init_params = snapshot_params(state)
    for _ in range(pruning_times):
        tx = make_unlearn_optimizer(cfg, len(loader))
        state = reset_opt_state(state, tx)
        step = make_pruned_train_step(model, tx, loss_sign=-1.0)
        for _ in range(cfg.unlearn_epochs):
            for batch in loader:
                key, sub = jax.random.split(key)
                state, _ = step(state, jax.tree.map(jnp.asarray, batch),
                                prune_mask, sub)
        if cfg.random_prune:
            key, pk = jax.random.split(key)
            prune_mask = pruner.global_random_prune(
                state.params, 1.0 - cfg.rate, pk, prune_mask
            )
        else:
            prune_mask = pruner.global_l1_prune(
                state.params, 1.0 - cfg.rate, prune_mask
            )
        if rewind:  # rewind_lt (GA_prune.py:102-110)
            state = state.replace(params=jax.tree.map(jnp.copy, init_params))
    return state.replace(params=pruner.apply_prune_mask(state.params, prune_mask))
