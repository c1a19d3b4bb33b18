"""One-shot magnitude pruning + rewind training.

Parity with Classification/pruner/omp.py + synflow.py and the
``train_with_rewind`` utility the reference declares but never defines
(trainer/__init__.py:1 — a latent ImportError; SURVEY.md §2.1 Trainer note).

``train_with_rewind`` trains while snapshotting the params at
``rewind_epoch`` (lottery-ticket rewinding); ``omp_prune`` performs global
L1 (or score-based) one-shot pruning and rewinds to the snapshot.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from salun.core import pruner
from salun.core.train import TrainState, make_train_step


def train_with_rewind(model, state: TrainState, tx, loader, epochs: int,
                      rewind_epoch: int, key, *, prune_mask=None,
                      num_classes: int = 10):
    """Train; return (final_state, rewind_params snapshot)."""
    if prune_mask is None:
        step = make_train_step(model, tx, num_classes=num_classes)

        def run_step(st, batch, k):
            return step(st, batch, k)
    else:
        from salun.core.methods.prune_variants import make_pruned_train_step

        pstep = make_pruned_train_step(model, tx)

        def run_step(st, batch, k):
            new_st, _ = pstep(st, batch, prune_mask, k)
            return new_st, {}

    rewind = None
    for epoch in range(epochs):
        if epoch == rewind_epoch:
            rewind = jax.tree.map(jnp.copy, state.params)
        for batch in loader:
            key, sub = jax.random.split(key)
            state, _ = run_step(state, jax.tree.map(jnp.asarray, batch), sub)
    if rewind is None:
        rewind = jax.tree.map(jnp.copy, state.params)
    return state, rewind


def omp_prune(model, state: TrainState, tx, loader, *, rate: float,
              epochs: int, rewind_epoch: int, key,
              score: str = "l1", input_shape=(1, 32, 32, 3),
              num_classes: int = 10, synflow_iterations: int = 100):
    """One-shot magnitude pruning (pruner/omp.py): train → global prune at
    ``rate`` → rewind weights → return (state_at_rewind, prune_mask)."""
    state, rewind = train_with_rewind(model, state, tx, loader, epochs,
                                      rewind_epoch, key,
                                      num_classes=num_classes)
    if score == "l1":
        mask = pruner.global_l1_prune(state.params, rate)
    elif score == "random":
        key, pk = jax.random.split(key)
        mask = pruner.global_random_prune(state.params, rate, pk)
    elif score == "synflow":
        # the reference's iterative-100 schedule (utils.py:304-316)
        mask = pruner.synflow_prune(model, state.params, rate, input_shape,
                                    iterations=synflow_iterations)
    else:
        raise ValueError(score)
    state = state.replace(params=rewind, opt_state=tx.init(rewind))
    return state, mask
