"""Shared scaffolding for unlearning methods.

Covers the reference's ``@iterative_unlearn`` decorator
(Classification/unlearn/impl.py:54-127): SGD(momentum, wd) with per-epoch
MultiStepLR (γ=0.1) — or epoch-level cosine warmup for ImageNet retrain —
wrapped around a per-epoch body. Here the body is a jitted step function and
the scaffolding is a plain function, not a decorator: methods are pure
``(loaders, model, state, cfg, mask, key) → state``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from salun.core import masked_opt
from salun.core.train import TrainState, cosine_warmup_lr, multistep_lr


@dataclass
class UnlearnConfig:
    """Typed equivalent of the reference's argparse namespace
    (Classification/arg_parser.py:4-145, unlearn group)."""

    dataset: str = "cifar10"
    num_classes: int = 10
    arch: str = "resnet18"
    imagenet_arch: bool = False

    unlearn_lr: float = 0.01
    unlearn_epochs: int = 10
    momentum: float = 0.9
    weight_decay: float = 5e-4
    decreasing_lr: str = "91,136"
    warmup: int = 0
    batch_size: int = 256

    alpha: float = 0.2          # l1 coeff / fisher noise / wfisher scale
    no_l1_epochs: int = 0
    mask_ratio: float = 0.5     # RL_proximal
    class_to_replace: int = -1
    num_indexes_to_replace: Optional[int] = None

    # prune-variant knobs (unlearn/GA_prune.py etc.)
    rate: float = 0.95
    prune_step: int = 1
    random_prune: bool = False

    seed: int = 2
    print_freq: int = 50


def make_unlearn_optimizer(
    cfg: UnlearnConfig,
    steps_per_epoch: int,
    mask=None,
    theta0=None,
    retrain: bool = False,
):
    """Optimizer + schedule per impl.py:68-97."""
    milestones = [int(x) for x in str(cfg.decreasing_lr).split(",") if x]
    if cfg.imagenet_arch and retrain:
        sched = cosine_warmup_lr(
            cfg.unlearn_lr, cfg.warmup, cfg.unlearn_epochs, steps_per_epoch
        )
    else:
        sched = multistep_lr(cfg.unlearn_lr, milestones, steps_per_epoch)
    if mask is not None and theta0 is not None:
        # fused single-pass masked SGD (identical semantics, ~25% faster)
        return masked_opt.masked_sgd_fused(
            sched, cfg.momentum, cfg.weight_decay, mask, theta0
        )
    base = masked_opt.sgd(sched, cfg.momentum, cfg.weight_decay)
    if mask is None:
        return base
    return optax.chain(masked_opt.mask_grads(mask), base)


def reset_opt_state(state: TrainState, tx) -> TrainState:
    """Fresh optimizer state for a new unlearning phase.

    Deep-copies the param/batch-stat buffers: the jitted steps donate their
    input state, and donation would otherwise delete the caller's arrays
    (and any θ₀ aliasing them).
    """
    return state.replace(
        params=jax.tree.map(jnp.copy, state.params),
        batch_stats=jax.tree.map(jnp.copy, state.batch_stats),
        opt_state=tx.init(state.params),
        step=jnp.zeros((), jnp.int32),
    )


def snapshot_params(state: TrainState):
    """θ₀ snapshot that survives later donation of the live state."""
    return jax.tree.map(jnp.copy, state.params)


def run_epochs(state, epochs: int, epoch_fn, key):
    """Plain epoch loop (the decorator's loop, impl.py:102-116)."""
    for epoch in range(epochs):
        key, sub = jax.random.split(key)
        state = epoch_fn(state, epoch, sub)
    return state
