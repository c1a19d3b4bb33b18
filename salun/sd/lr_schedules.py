"""LDM learning-rate schedules as pure optax-style schedules.

Parity with SD/ldm/lr_scheduler.py:4-135 (LambdaWarmUpCosineScheduler,
LambdaWarmUpCosineScheduler2, LambdaLinearScheduler — the scheduler
v1-inference-style training configs reference). The reference implements
them as stateful host callables for torch's LambdaLR; here each is a pure
function of the step count (jnp ops, jit/scan-safe), to be multiplied onto
a base LR of 1.0 exactly as the reference notes.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def warmup_cosine(warm_up_steps: int, lr_min: float, lr_max: float,
                  lr_start: float, max_decay_steps: int):
    """LambdaWarmUpCosineScheduler (lr_scheduler.py:4-48)."""

    def schedule(n):
        n = jnp.asarray(n, jnp.float32)
        warm = (lr_max - lr_start) / warm_up_steps * n + lr_start
        t = jnp.minimum(
            (n - warm_up_steps) / (max_decay_steps - warm_up_steps), 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < warm_up_steps, warm, cos)

    return schedule


def _cycle_index(cum_cycles: np.ndarray):
    """Reference semantics: interval i such that n <= cum_cycles[i+1]
    (lr_scheduler.py:77-82 — note the inclusive boundary)."""

    def find(n):
        # searchsorted(left) over the cumulative boundaries reproduces
        # `n <= cl` because boundaries are integers and n is an int step.
        return jnp.searchsorted(jnp.asarray(cum_cycles[1:]), n, side="left")

    return find


def _multi_cycle(warm_up_steps, f_min, f_max, f_start, cycle_lengths,
                 tail_fn):
    warm_up_steps = np.asarray(warm_up_steps, np.float32)
    f_min = np.asarray(f_min, np.float32)
    f_max = np.asarray(f_max, np.float32)
    f_start = np.asarray(f_start, np.float32)
    cycle_lengths = np.asarray(cycle_lengths, np.float32)
    assert (len(warm_up_steps) == len(f_min) == len(f_max) == len(f_start)
            == len(cycle_lengths))
    cum = np.cumsum(np.concatenate([[0.0], cycle_lengths]))
    find = _cycle_index(cum)

    def schedule(n):
        n = jnp.asarray(n, jnp.float32)
        c = jnp.clip(find(n), 0, len(cycle_lengths) - 1)
        nn = n - jnp.asarray(cum)[c]
        wu = jnp.asarray(warm_up_steps)[c]
        fmin, fmax = jnp.asarray(f_min)[c], jnp.asarray(f_max)[c]
        fstart = jnp.asarray(f_start)[c]
        cl = jnp.asarray(cycle_lengths)[c]
        warm = (fmax - fstart) / wu * nn + fstart
        return jnp.where(nn < wu, warm, tail_fn(nn, wu, fmin, fmax, cl))

    return schedule


def warmup_cosine2(warm_up_steps: Sequence[float], f_min, f_max, f_start,
                   cycle_lengths):
    """LambdaWarmUpCosineScheduler2 (lr_scheduler.py:51-111)."""

    def tail(nn, wu, fmin, fmax, cl):
        t = jnp.minimum((nn - wu) / (cl - wu), 1.0)
        return fmin + 0.5 * (fmax - fmin) * (1 + jnp.cos(t * jnp.pi))

    return _multi_cycle(warm_up_steps, f_min, f_max, f_start, cycle_lengths,
                        tail)


def lambda_linear(warm_up_steps: Sequence[float], f_min, f_max, f_start,
                  cycle_lengths):
    """LambdaLinearScheduler (lr_scheduler.py:114-135) — the scheduler the
    LDM training configs instantiate."""

    def tail(nn, wu, fmin, fmax, cl):
        return fmin + (fmax - fmin) * (cl - nn) / cl

    return _multi_cycle(warm_up_steps, f_min, f_max, f_start, cycle_lengths,
                        tail)
