"""Iterative unlearning methods: RL (SalUn core), GA(+l1), FT(+l1), retrain.

Parity targets:
- RL  — Classification/unlearn/RL.py:37-178 (random labeling; the SalUn
  method when combined with a saliency mask). Two dataset regimes:
  CIFAR-100/TinyImageNet relabel the forget set once per epoch and train on
  forget∪retain (RL.py:51-107); CIFAR-10/SVHN draw fresh random labels per
  batch on a forget pass, then do a retain pass (RL.py:109-176).
- GA  — unlearn/GA.py (gradient ascent on the forget set, loss = -CE);
  GA_l1 adds α‖θ‖₁.
- FT  — unlearn/FT.py:44-180 (fine-tune on retain only); FT_l1's l1
  coefficient decays linearly over epochs (FT.py:77-82).
- retrain — unlearn/retrain.py:6-9 (train from the current init on retain).

All methods run the full SalUn masking (grad mask + θ₀ pin + momentum
masking) when a mask is given, fused into the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from salun.core.train import TrainState, make_train_step, run_epoch
from salun.data.loader import BatchIterator

from .common import (
    UnlearnConfig, make_unlearn_optimizer, reset_opt_state, snapshot_params,
)


def _relabel_concat_loader(loaders, cfg: UnlearnConfig, epoch: int):
    """Forget set with fresh random labels, concatenated with retain and
    shuffled (RL.py:51-59). Relabeling uses a Generator seeded from
    (cfg.seed, epoch) — never the global np.random state, so the CIFAR-100
    RL trajectory is reproducible regardless of call order."""
    gen = np.random.default_rng(np.random.SeedSequence([cfg.seed, epoch]))
    forget = loaders["forget"].ds.copy()
    forget.targets = gen.integers(
        0, cfg.num_classes, forget.targets.shape, dtype=forget.targets.dtype)
    retain = loaders["retain"].ds
    import numpy as _np
    from dataclasses import replace as dc_replace

    data = _np.concatenate([forget.data, retain.data])
    targets = _np.concatenate([forget.targets, retain.targets])
    merged = dc_replace(forget, data=data, targets=targets)
    return BatchIterator(merged, cfg.batch_size, shuffle=True,
                         seed=cfg.seed + epoch)


def RL(loaders, model, state: TrainState, cfg: UnlearnConfig, mask=None,
       key=None):
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    steps_per_epoch = len(loaders["forget"]) + len(loaders["retain"])
    theta0 = snapshot_params(state) if mask is not None else None
    tx = make_unlearn_optimizer(cfg, steps_per_epoch, mask, theta0)
    state = reset_opt_state(state, tx)

    if cfg.dataset in ("cifar100", "TinyImagenet"):
        step = make_train_step(model, tx, num_classes=cfg.num_classes)
        for epoch in range(cfg.unlearn_epochs):
            loader = _relabel_concat_loader(loaders, cfg, epoch)
            state, _, key = run_epoch(step, state, loader, key)
    else:  # cifar10 / svhn path (RL.py:109-176)
        forget_step = make_train_step(
            model, tx, random_labels=True, num_classes=cfg.num_classes
        )
        retain_step = make_train_step(model, tx, num_classes=cfg.num_classes)
        for epoch in range(cfg.unlearn_epochs):
            state, _, key = run_epoch(forget_step, state, loaders["forget"],
                                      key)
            state, _, key = run_epoch(retain_step, state, loaders["retain"],
                                      key)
    return state


def _single_loader_method(loader_name: str, loss_sign: float,
                          l1_mode: str = "none"):
    def method(loaders, model, state: TrainState, cfg: UnlearnConfig,
               mask=None, key=None):
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        loader = loaders[loader_name]
        steps_per_epoch = len(loader)
        theta0 = snapshot_params(state) if mask is not None else None
        tx = make_unlearn_optimizer(cfg, steps_per_epoch, mask, theta0)
        state = reset_opt_state(state, tx)

        l1_coeff = None
        if l1_mode == "const":
            # GA_l1: constant α‖θ‖₁ (GA.py:177)
            def l1_coeff(step):  # noqa: F811
                return cfg.alpha
        elif l1_mode == "decay":
            e_l1 = max(cfg.unlearn_epochs - cfg.no_l1_epochs, 1)

            def l1_coeff(step):  # noqa: F811 — FT.py:77-82 linear decay
                epoch = step // steps_per_epoch
                coeff = cfg.alpha * (1.0 - epoch / e_l1)
                return jnp.where(epoch < e_l1, coeff, 0.0)

        step = make_train_step(
            model, tx, loss_sign=loss_sign, l1_coeff=l1_coeff,
            num_classes=cfg.num_classes,
        )
        for _ in range(cfg.unlearn_epochs):
            state, _, key = run_epoch(step, state, loader, key)
        return state

    return method


GA = _single_loader_method("forget", loss_sign=-1.0)
GA_l1 = _single_loader_method("forget", loss_sign=-1.0, l1_mode="const")
FT = _single_loader_method("retain", loss_sign=1.0)
FT_l1 = _single_loader_method("retain", loss_sign=1.0, l1_mode="decay")


def retrain(loaders, model, state: TrainState, cfg: UnlearnConfig, mask=None,
            key=None):
    """Exact unlearning: train on retain from the passed-in (fresh) params
    (unlearn/retrain.py; the driver skips loading θ, main_forget.py:131-132).
    Uses the cosine-warmup schedule for ImageNet archs (impl.py:75-93)."""
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    loader = loaders["retain"]
    tx = make_unlearn_optimizer(cfg, len(loader), retrain=True)
    state = reset_opt_state(state, tx)
    step = make_train_step(model, tx, num_classes=cfg.num_classes)
    for _ in range(cfg.unlearn_epochs):
        state, _, key = run_epoch(step, state, loader, key)
    return state


def raw(loaders, model, state, cfg, mask=None, key=None):
    """No-op baseline (unlearn/__init__.py raw)."""
    return state
