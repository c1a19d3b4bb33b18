"""Diffusion beta schedules and derived quantities.

Parity with DDPM/runners/diffusion.py:36-99 (get_beta_schedule + the
Diffusion.__init__ posterior computation): linear / quad / const / jsd /
sigmoid schedules computed in float64 then cast, alphas-cumprod, posterior
log-variance for fixedlarge/fixedsmall.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


def get_beta_schedule(
    beta_schedule: str, *, beta_start: float, beta_end: float,
    num_diffusion_timesteps: int,
) -> np.ndarray:
    T = num_diffusion_timesteps
    if beta_schedule == "quad":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, T, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, T, dtype=np.float64)
    elif beta_schedule == "const":
        betas = beta_end * np.ones(T, dtype=np.float64)
    elif beta_schedule == "jsd":
        betas = 1.0 / np.linspace(T, 1, T, dtype=np.float64)
    elif beta_schedule == "sigmoid":
        x = np.linspace(-6, 6, T)
        betas = 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (T,)
    return betas


@dataclass(frozen=True)
class DiffusionSchedule:
    betas: jnp.ndarray            # [T] float32
    alphas_cumprod: jnp.ndarray   # [T]
    logvar: jnp.ndarray           # [T] sampling log-variance

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    @classmethod
    def create(cls, beta_schedule="linear", beta_start=1e-4, beta_end=2e-2,
               num_diffusion_timesteps=1000, var_type="fixedlarge"):
        betas64 = get_beta_schedule(
            beta_schedule, beta_start=beta_start, beta_end=beta_end,
            num_diffusion_timesteps=num_diffusion_timesteps,
        )
        alphas = 1.0 - betas64
        acp = np.cumprod(alphas)
        acp_prev = np.concatenate([[1.0], acp[:-1]])
        posterior_var = betas64 * (1.0 - acp_prev) / (1.0 - acp)
        if var_type == "fixedlarge":
            logvar = np.log(betas64)
        elif var_type == "fixedsmall":
            logvar = np.log(np.maximum(posterior_var, 1e-20))
        else:
            raise NotImplementedError(var_type)
        # HOST (numpy) tables, not device arrays: the schedule is closed
        # over by every jitted step, and embedding device-resident
        # constants forces a device->host fetch per lowering — minutes
        # through a congested remote tunnel. Numpy constants lower
        # locally; inside jit they are baked in identically.
        return cls(
            betas=np.asarray(betas64, np.float32),
            alphas_cumprod=np.asarray(acp, np.float32),
            logvar=np.asarray(logvar, np.float32),
        )

    def alpha_bar(self, t):
        """ᾱ_t with boundary ᾱ_{-1}=1 (denoising.py compute_alpha)."""
        acp = jnp.concatenate([jnp.ones((1,), jnp.float32),
                               jnp.asarray(self.alphas_cumprod)])
        return acp[t + 1]


def q_sample(x0, t, noise, schedule: DiffusionSchedule):
    """Forward process x_t = √ᾱ_t·x₀ + √(1−ᾱ_t)·ε (losses.py:31-33)."""
    # jnp view: numpy tables can't be indexed by traced t
    a = jnp.asarray(schedule.alphas_cumprod)[t].reshape(-1, 1, 1, 1)
    return x0 * jnp.sqrt(a) + noise * jnp.sqrt(1.0 - a)


def antithetic_timesteps(key, batch: int, num_timesteps: int):
    """t and T−t−1 paired (runners/diffusion.py:222-226 antithetic trick).

    The reference draws ``n//2 + 1`` base samples (one extra for even n,
    so the last mirror is dropped by the [:n] slice), not ``ceil(n/2)``."""
    import jax

    half = jax.random.randint(key, (batch // 2 + 1,), 0, num_timesteps)
    t = jnp.concatenate([half, num_timesteps - half - 1])[:batch]
    return t


def data_transform(x, rescaled: bool = True):
    """[0,1] → [−1,1] (DDPM/datasets/__init__.py:241-255)."""
    return 2.0 * x - 1.0 if rescaled else x


def inverse_data_transform(x, rescaled: bool = True):
    y = (x + 1.0) / 2.0 if rescaled else x
    return jnp.clip(y, 0.0, 1.0)
