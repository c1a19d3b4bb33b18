"""Saliency-masked optimizers.

SalUn's update rule (reference Classification/unlearn/RL.py:11-34):
  1. after backward: ``grad *= mask``            (RL.py:11-14)
  2. optimizer step
  3. masked-out weights restored to theta0 and their momentum zeroed
     (RL.py:17-34)

The reference implements this as two Python loops over ``named_parameters``
per step. Here it is one optax ``GradientTransformation`` wrapper — the mask
multiply, base-optimizer math, theta0 pinning, and momentum masking all fuse
into the jitted train step (one elementwise pass over the params, no host
round-trips).

DDPM/SD apply only the grad mask (DDPM/runners/diffusion.py:589-592,
SD/train-scripts/random_label.py:132-137) — use ``mask_grads`` alone there.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


# NB on state-carried masks: every transform below stores its mask (and
# theta0) in the optimizer STATE rather than capturing it in the update
# closure. A closed-over pytree is embedded into the jitted step's HLO as
# literal constants — 143 MB of literals for a 35.7M-param mask (GBs for
# SD) — which makes every (re)compile minutes-slow and bloats the compile
# cache; as a state leaf it is just another device-array argument.
# Corollary: tx.init must run EAGERLY (jitting init would re-embed the
# mask into the init graph's output literals). init COPIES the pytrees:
# the train steps donate their optimizer state, and two states sharing
# one mask buffer would delete each other's arrays on the first step.


class MaskGradsState(NamedTuple):
    mask: Any


def mask_grads(mask) -> optax.GradientTransformation:
    """``grads *= mask`` (mask is a pytree of 0/1 arrays matching params)."""

    def init(params):
        del params
        return MaskGradsState(mask=jax.tree.map(jnp.copy, mask))

    def update(updates, state, params=None):
        del params
        updates = jax.tree.map(lambda g, m: g * m.astype(g.dtype), updates,
                               state.mask)
        return updates, state

    return optax.GradientTransformation(init, update)


class MaskedState(NamedTuple):
    inner: optax.OptState
    mask: Any
    theta0: Any


def masked(
    base: optax.GradientTransformation,
    mask,
    theta0,
) -> optax.GradientTransformation:
    """Full SalUn masking around ``base``.

    - incoming grads are multiplied by ``mask``;
    - the base optimizer's momentum-like state is re-masked every step
      (parity with momentum_buffer zeroing, RL.py:31-34);
    - the emitted update on masked-out coordinates is exactly
      ``theta0 - params`` so ``optax.apply_updates`` pins them to theta0
      (parity with the theta0 restore, RL.py:25-29) regardless of weight
      decay or momentum leakage inside ``base``.
    """

    def init(params):
        return MaskedState(inner=base.init(params),
                           mask=jax.tree.map(jnp.copy, mask),
                           theta0=jax.tree.map(jnp.copy, theta0))

    def update(updates, state, params):
        mask_, theta0_ = state.mask, state.theta0
        updates = jax.tree.map(lambda g, m: g * m.astype(g.dtype), updates,
                               mask_)
        new_updates, inner = base.update(updates, state.inner, params)
        # Zero momentum-like accumulators on masked-out coordinates. All
        # params-shaped leaves of the optimizer state (sgd trace, adam mu/nu)
        # are masked; step counters etc. are left alone.
        inner = optax.tree_utils.tree_map_params(
            base, lambda s, m: s * m.astype(s.dtype), inner, mask_
        )
        new_updates = jax.tree.map(
            lambda u, m, p, t0: jnp.where(m > 0, u, t0 - p),
            new_updates, mask_, params, theta0_,
        )
        return new_updates, MaskedState(inner=inner, mask=mask_,
                                        theta0=theta0_)

    return optax.GradientTransformation(init, update)


class FusedMaskedSGDState(NamedTuple):
    trace: Any
    count: jnp.ndarray
    mask: Any
    theta0: Any


def masked_sgd_fused(
    learning_rate,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    mask=None,
    theta0=None,
) -> optax.GradientTransformation:
    """Single-pass fused SalUn masked SGD.

    Semantically identical to ``masked(sgd(...), mask, theta0)`` but does
    the whole update in ONE tree_map per leaf — momentum read+write, grad
    mask, weight decay, θ₀ pin — so XLA emits one fused elementwise kernel
    per parameter instead of five passes (measured ~25%+ step speedup on
    v5e for ResNet-18).
    """

    def init(params):
        return FusedMaskedSGDState(
            trace=jax.tree.map(jnp.zeros_like, params),
            count=jnp.zeros((), jnp.int32),
            mask=jax.tree.map(jnp.copy, mask),
            theta0=jax.tree.map(jnp.copy, theta0),
        )

    def update(grads, state, params):
        lr = (learning_rate(state.count)
              if callable(learning_rate) else learning_rate)

        def one(g, buf, p, m, t0):
            keep = m > 0
            buf_new = jnp.where(
                keep, momentum * buf + g * m + weight_decay * p, 0.0
            )
            u = jnp.where(keep, -lr * buf_new, t0 - p)
            return u, buf_new

        flat_g = jax.tree.leaves(grads)
        flat_b = jax.tree.leaves(state.trace)
        flat_p = jax.tree.leaves(params)
        flat_m = jax.tree.leaves(state.mask)
        flat_t = jax.tree.leaves(state.theta0)
        outs = [one(*args) for args in zip(flat_g, flat_b, flat_p, flat_m,
                                           flat_t)]
        treedef = jax.tree.structure(grads)
        updates = jax.tree.unflatten(treedef, [o[0] for o in outs])
        trace = jax.tree.unflatten(treedef, [o[1] for o in outs])
        return updates, FusedMaskedSGDState(trace=trace,
                                            count=state.count + 1,
                                            mask=state.mask,
                                            theta0=state.theta0)

    return optax.GradientTransformation(init, update)


def sgd(
    learning_rate,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
) -> optax.GradientTransformation:
    """torch.optim.SGD semantics (grad += wd*p; buf = m*buf + grad; p -= lr*buf).

    Parity with the optimizer every classification run uses
    (Classification/unlearn/impl.py:68-73, main_train.py). Note torch SGD
    couples weight decay into the momentum buffer — ``optax.sgd`` +
    ``add_decayed_weights`` ordering below reproduces that exactly.
    """
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(learning_rate),
    )


def build_optimizer(
    learning_rate,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    mask=None,
    theta0=None,
    kind: str = "sgd",
) -> optax.GradientTransformation:
    """Optimizer factory used by the unlearning methods.

    ``mask`` given + ``theta0`` given  → full SalUn masked optimizer.
    ``mask`` given, no ``theta0``      → grad-mask only (DDPM/SD style).
    """
    if kind == "sgd":
        if mask is not None and theta0 is not None:
            return masked_sgd_fused(learning_rate, momentum, weight_decay,
                                    mask, theta0)
        base = sgd(learning_rate, momentum, weight_decay)
    elif kind == "adam":
        base = optax.adam(learning_rate)
    else:
        raise ValueError(f"unknown optimizer kind {kind!r}")

    if mask is None:
        return base
    if theta0 is None:
        return optax.chain(mask_grads(mask), base)
    return masked(base, mask, theta0)
