"""Diffusion samplers: DDIM (generalized) and ancestral DDPM steps.

Parity with DDPM/functions/denoising.py:10-131 — same update equations —
but TPU-first: the whole reverse chain is a single ``lax.scan`` compiled on
device. The reference offloads every intermediate x_t to CPU per step
(denoising.py:31,93); here nothing leaves HBM and the chain is one XLA
program.

CFG sampling uses the doubled-batch trick from salun.diffusion.unet.cfg_eps
(one U-Net forward per step instead of two).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule
from .unet import ConditionalUNet, cfg_eps


def _seq_pairs(seq: Sequence[int]):
    """(t_i, t_{i-1}) pairs walked in reverse, with boundary −1."""
    seq = list(seq)
    seq_next = [-1] + seq[:-1]
    ts = jnp.asarray(list(reversed(seq)), jnp.int32)
    ts_next = jnp.asarray(list(reversed(seq_next)), jnp.int32)
    return ts, ts_next


def ldm_uniform_timesteps(num_ddpm_timesteps: int, num_steps: int):
    """The ldm 'uniform' DDIM discretization: ``range(0, T, T//S) + 1``
    (SD/ldm/modules/diffusionmodules/util.py make_ddim_timesteps — note the
    +1 shift; the DDPM workload's own seq, sample.py, is NOT shifted).

    Use with ``final_alpha_bar=schedule.alphas_cumprod[0]``: ldm's
    make_ddim_sampling_parameters sets alphas_prev[0] = ᾱ₀ (not 1.0)."""
    c = num_ddpm_timesteps // num_steps
    return [int(s) + 1 for s in range(0, num_ddpm_timesteps, c)]


def generalized_steps(
    eps_fn: Callable, x: jnp.ndarray, seq: Sequence[int],
    schedule: DiffusionSchedule, *, eta: float = 0.0, key=None,
    final_alpha_bar: Optional[float] = None, return_trajectory: bool = False,
):
    """DDIM chain (denoising.py:10-33). ``eps_fn(x, t_batch) -> eps``.

    ``final_alpha_bar`` overrides ᾱ at the −1 boundary (default 1.0, the
    DDPM compute_alpha zero-pad; ldm's DDIMSampler uses ᾱ₀ instead).
    Returns the final x and the last x0 prediction; with
    ``return_trajectory=True`` instead returns (x_final, xs, x0_preds)
    where xs/x0_preds are [steps, B, H, W, C] — the whole chain the
    reference keeps for visualization (denoising.py:31,93), here staying
    on device as scan outputs instead of per-step CPU offloads.
    """
    ts, ts_next = _seq_pairs(seq)
    n = x.shape[0]
    key = key if key is not None else jax.random.PRNGKey(0)

    def body(carry, t_pair):
        xt, k = carry
        i, j = t_pair
        t = jnp.full((n,), i, jnp.int32)
        at = schedule.alpha_bar(jnp.full((n,), i, jnp.int32)).reshape(-1, 1, 1, 1)
        at_next = schedule.alpha_bar(jnp.full((n,), j, jnp.int32)).reshape(-1, 1, 1, 1)
        if final_alpha_bar is not None:
            at_next = jnp.where(j < 0, jnp.float32(final_alpha_bar), at_next)
        et = eps_fn(xt, t.astype(jnp.float32))
        x0_t = (xt - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
        c1 = eta * jnp.sqrt((1 - at / at_next) * (1 - at_next) / (1 - at))
        c2 = jnp.sqrt((1 - at_next) - c1**2)
        k, sub = jax.random.split(k)
        noise = jax.random.normal(sub, xt.shape, xt.dtype)
        xt_next = jnp.sqrt(at_next) * x0_t + c1 * noise + c2 * et
        out = (xt_next, x0_t) if return_trajectory else x0_t
        return (xt_next, k), out

    (x_final, _), outs = jax.lax.scan(body, (x, key),
                                      jnp.stack([ts, ts_next], axis=1))
    if return_trajectory:
        xs, x0_preds = outs
        return x_final, xs, x0_preds
    return x_final, outs[-1]


def ddpm_steps(
    eps_fn: Callable, x: jnp.ndarray, seq: Sequence[int],
    schedule: DiffusionSchedule, *, key=None,
    return_trajectory: bool = False,
):
    """Ancestral sampling (denoising.py:36-69)."""
    ts, ts_next = _seq_pairs(seq)
    n = x.shape[0]
    key = key if key is not None else jax.random.PRNGKey(0)

    def body(carry, t_pair):
        xt, k = carry
        i, j = t_pair
        t = jnp.full((n,), i, jnp.int32)
        at = schedule.alpha_bar(t).reshape(-1, 1, 1, 1)
        atm1 = schedule.alpha_bar(jnp.full((n,), j, jnp.int32)).reshape(-1, 1, 1, 1)
        beta_t = 1.0 - at / atm1
        e = eps_fn(xt, t.astype(jnp.float32))
        x0 = jnp.sqrt(1.0 / at) * xt - jnp.sqrt(1.0 / at - 1.0) * e
        x0 = jnp.clip(x0, -1.0, 1.0)
        mean = (
            jnp.sqrt(atm1) * beta_t * x0
            + jnp.sqrt(1.0 - beta_t) * (1.0 - atm1) * xt
        ) / (1.0 - at)
        k, sub = jax.random.split(k)
        noise = jax.random.normal(sub, xt.shape, xt.dtype)
        mask = (t > 0).astype(xt.dtype).reshape(-1, 1, 1, 1)
        logvar = jnp.log(beta_t)
        sample = mean + mask * jnp.exp(0.5 * logvar) * noise
        out = (sample, x0) if return_trajectory else x0
        return (sample, k), out

    (x_final, _), outs = jax.lax.scan(body, (x, key),
                                      jnp.stack([ts, ts_next], axis=1))
    if return_trajectory:
        xs, x0_preds = outs
        return x_final, xs, x0_preds
    return x_final, outs[-1]


def make_conditional_eps_fn(model: ConditionalUNet, variables,
                            c: jnp.ndarray, cond_scale: float):
    """eps_fn for class-conditional CFG sampling
    (denoising.py:72-95 / diffusion.py:340-355)."""

    def eps_fn(x, t):
        return cfg_eps(model, variables, x, t, c, cond_scale)

    return eps_fn


def sample_image(
    model: ConditionalUNet, variables, schedule: DiffusionSchedule, key,
    *, batch: int, image_size: int, channels: int, classes: jnp.ndarray,
    cond_scale: float = 2.0, sample_type: str = "generalized",
    timesteps: Optional[int] = None, skip_type: str = "uniform",
    eta: float = 0.0, return_trajectory: bool = False,
):
    """Full image sampling pipeline (runners/diffusion.py sample_image):
    build the timestep subsequence, run the chain, return x in [−1,1].
    With ``return_trajectory=True`` returns (x, xs, x0_preds) — the
    per-step chain the reference's sample mode visualizes
    (denoising.py:31,93 keep every x_t)."""
    T = schedule.num_timesteps
    timesteps = timesteps or T
    if skip_type == "uniform":
        skip = T // timesteps
        seq = list(range(0, T, skip))
    elif skip_type == "quad":
        import numpy as np

        seq = (np.linspace(0, np.sqrt(T * 0.8), timesteps) ** 2).astype(int)
        seq = list(seq)
    else:
        raise NotImplementedError(skip_type)

    key, nk = jax.random.split(key)
    x = jax.random.normal(nk, (batch, image_size, image_size, channels))
    # shard the chain over an active --dp mesh: the initial noise is the
    # only array with a batch dim created in-graph, so one constraint here
    # propagates through the whole scan (FID sampling is embarrassingly
    # batch-parallel — the reference fans it over 2 GPUs by hand,
    # runners/diffusion.py:773-824 under DataParallel)
    from salun.dist import context as dist_ctx

    x = dist_ctx.constrain_batch(x)
    eps_fn = make_conditional_eps_fn(model, variables, classes, cond_scale)
    if sample_type == "generalized":
        out = generalized_steps(eps_fn, x, seq, schedule, eta=eta, key=key,
                                return_trajectory=return_trajectory)
    elif sample_type == "ddpm_noisy":
        out = ddpm_steps(eps_fn, x, seq, schedule, key=key,
                         return_trajectory=return_trajectory)
    else:
        raise NotImplementedError(sample_type)
    return out if return_trajectory else out[0]


def plms_steps(
    eps_fn: Callable, x: jnp.ndarray, seq: Sequence[int],
    schedule: DiffusionSchedule, final_alpha_bar: Optional[float] = None,
):
    """PLMS sampler (SD/ldm/models/diffusion/plms.py:268-382): pseudo
    linear multistep — Adams-Bashforth combination of the last ≤4 eps
    predictions, with a pseudo-improved-Euler bootstrap on the first step.
    Deterministic (eta=0). Implemented as a lax.scan with a fixed-size
    eps-history buffer so the whole chain is one compiled program."""
    ts, ts_next = _seq_pairs(seq)
    n = x.shape[0]

    def x_prev_from(e, xt, i, j):
        at = schedule.alpha_bar(jnp.full((n,), i, jnp.int32)).reshape(-1, 1, 1, 1)
        a_prev = schedule.alpha_bar(jnp.full((n,), j, jnp.int32)).reshape(-1, 1, 1, 1)
        if final_alpha_bar is not None:
            a_prev = jnp.where(j < 0, jnp.float32(final_alpha_bar), a_prev)
        pred_x0 = (xt - jnp.sqrt(1.0 - at) * e) / jnp.sqrt(at)
        dir_xt = jnp.sqrt(1.0 - a_prev) * e
        return jnp.sqrt(a_prev) * pred_x0 + dir_xt, pred_x0

    def body(carry, t_pair):
        xt, hist, count = carry   # hist: [4, ...] newest at index 0
        i, j = t_pair
        t = jnp.full((n,), i, jnp.float32)
        t_next = jnp.full((n,), j, jnp.float32)
        e_t = eps_fn(xt, t)

        # bootstrap branch: pseudo improved Euler (plms.py:363-367)
        def boot():
            x_prev0, _ = x_prev_from(e_t, xt, i, j)
            e_next = eps_fn(x_prev0, t_next)
            return (e_t + e_next) / 2.0

        # multistep branches (plms.py:368-379)
        def ab1():
            return (3 * e_t - hist[0]) / 2.0

        def ab2():
            return (23 * e_t - 16 * hist[0] + 5 * hist[1]) / 12.0

        def ab3():
            return (55 * e_t - 59 * hist[0] + 37 * hist[1]
                    - 9 * hist[2]) / 24.0

        e_prime = jax.lax.switch(jnp.minimum(count, 3),
                                 [boot, ab1, ab2, ab3])
        x_prev, pred_x0 = x_prev_from(e_prime, xt, i, j)
        new_hist = jnp.concatenate([e_t[None], hist[:3]], axis=0)
        return (x_prev, new_hist, count + 1), pred_x0

    hist0 = jnp.zeros((4,) + x.shape, x.dtype)
    (x_final, _, _), x0s = jax.lax.scan(
        body, (x, hist0, jnp.int32(0)), jnp.stack([ts, ts_next], axis=1)
    )
    return x_final, x0s[-1]
