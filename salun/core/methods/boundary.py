"""Decision-boundary unlearning: boundary_shrink / boundary_expanding.

Parity with Classification/unlearn/boundary_sh.py:35-141 and
boundary_ex.py:34-138:
- *shrink*: FGSM-perturb forget inputs (bound 0.1, discretized to the
  255-grid) on a frozen copy of the original model, take the frozen model's
  prediction on the adversarial input as the new label, train the live
  model toward it.
- *expanding*: widen the final Dense layer by one extra class (existing
  rows copied, new row fresh-initialized — boundary_ex.py:36-67), push all
  forget samples toward that shadow class.

Both support the full SalUn masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from salun.core.train import (
    TrainState, cross_entropy, make_train_step, to_float, weighted_accuracy,
)
from salun.data.loader import augment

from .common import (
    UnlearnConfig, make_unlearn_optimizer, reset_opt_state, snapshot_params,
)

FGSM_BOUND = 0.1  # "hard coding in the paper" (boundary_sh.py:66)


def _discretize(x):
    return jnp.round(x * 255.0) / 255.0


def boundary_shrink(loaders, model, state: TrainState, cfg: UnlearnConfig,
                    mask=None, key=None):
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    loader = loaders["forget"]
    theta0 = snapshot_params(state) if mask is not None else None
    tx = make_unlearn_optimizer(cfg, len(loader), mask, theta0)
    state = reset_opt_state(state, tx)
    frozen = snapshot_params(state)
    frozen_bs = state.batch_stats

    @jax.jit
    def adv_labels(img, y):
        """FGSM on the frozen model against the TRUE forget label, then
        the frozen model's prediction on the adversarial input
        (boundary_sh.py:39-52,90-96 — FGSM_perturb receives ``target``
        from the loader, not a model prediction)."""
        variables = {"params": frozen}
        if frozen_bs:
            variables["batch_stats"] = frozen_bs

        def loss_fn(x):
            out = model.apply(variables, x, train=False)
            return cross_entropy(out, y)

        g = jax.grad(loss_fn)(img)
        x_adv = _discretize(jnp.clip(img + jnp.sign(g) * FGSM_BOUND, 0.0, 1.0))
        return jnp.argmax(model.apply(variables, x_adv, train=False), axis=-1)

    # The reference's forget loader carries the train transform (random
    # crop+flip, dataset.py:24-31), and the SAME augmented tensor feeds
    # both the FGSM label generation and the train step — so augment once
    # here and keep the step's own augmentation off.
    do_aug = not cfg.imagenet_arch
    step = make_train_step(model, tx, use_augment=False,
                           num_classes=cfg.num_classes)
    for _ in range(cfg.unlearn_epochs):
        for batch in loader:
            key, ka, sub = jax.random.split(key, 3)
            batch = jax.tree.map(jnp.asarray, batch)
            img = to_float(batch["image"])
            if do_aug:
                img = augment(ka, img)
            labels = adv_labels(img, batch["label"])
            batch = dict(batch, image=img, label=labels.astype(jnp.int32))
            state, _ = step(state, batch, sub)
    return state


def expand_head(model_factory, state: TrainState, cfg: UnlearnConfig, key):
    """Return (expanded_model, expanded_state): final Dense gets one extra
    output (boundary_ex.py:36-67); old rows copied, new column fresh."""
    wide_model = model_factory(cfg.arch, cfg.num_classes + 1,
                               imagenet=cfg.imagenet_arch)
    size = 224 if cfg.imagenet_arch else 32
    wide_vars = wide_model.init(key, jnp.zeros((1, size, size, 3)), train=False)
    wide_params = wide_vars["params"]

    def graft(wide, old):
        if wide.shape == old.shape:
            return old
        # classifier kernel [in, C+1] / bias [C+1]: copy first C entries
        out = wide
        sl = tuple(slice(0, s) for s in old.shape)
        return out.at[sl].set(old)

    new_params = jax.tree.map(graft, wide_params, state.params,
                              is_leaf=lambda x: hasattr(x, "shape"))
    return wide_model, state.replace(params=new_params,
                                     batch_stats=state.batch_stats)


def boundary_expanding(loaders, model, state: TrainState, cfg: UnlearnConfig,
                       mask=None, key=None, model_factory=None):
    from salun.models import create_model

    model_factory = model_factory or create_model
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    key, ek = jax.random.split(key)
    wide_model, wide_state = expand_head(model_factory, state, cfg, ek)

    # masks were generated for the narrow model; re-graft them into the wide
    # param shapes (new coords trainable = 1)
    wide_mask = None
    theta0 = None
    if mask is not None:
        ones = jax.tree.map(lambda p: jnp.ones_like(p, jnp.float32),
                            wide_state.params)

        def graft_mask(w, m):
            if w.shape == m.shape:
                return m
            sl = tuple(slice(0, s) for s in m.shape)
            return w.at[sl].set(m)

        wide_mask = jax.tree.map(graft_mask, ones, mask)
        theta0 = jax.tree.map(jnp.copy, wide_state.params)

    loader = loaders["forget"]
    tx = make_unlearn_optimizer(cfg, len(loader), wide_mask, theta0)
    wide_state = reset_opt_state(wide_state, tx)
    # reference parity: the forget loader augments (train transform);
    # the step's in-graph crop+flip reproduces that per batch draw
    step = make_train_step(wide_model, tx,
                           use_augment=not cfg.imagenet_arch,
                           num_classes=cfg.num_classes + 1)
    shadow = cfg.num_classes  # push forget samples here (boundary_ex.py:95-98)
    for _ in range(cfg.unlearn_epochs):
        for batch in loader:
            key, sub = jax.random.split(key)
            batch = jax.tree.map(jnp.asarray, batch)
            batch = dict(batch, label=jnp.full_like(batch["label"], shadow))
            wide_state, _ = step(wide_state, batch, sub)
    return wide_state, wide_model
