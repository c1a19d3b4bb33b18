"""LatentDiffusion — the SD v1 wrapper tying UNet + VAE + CLIP together.

Capability parity with the *used subset* of
SD/ldm/models/diffusion/ddpm.py (SURVEY.md §2.4): ``register_schedule``
(ddpm.py:153-246, ldm "linear" = √-space linspace), ``get_input`` (VAE
encode ×0.18215 + CLIP encode, ddpm.py:913-973), ``q_sample``
(ddpm.py:424-430), ``apply_model`` (ddpm.py:1121-1262, plain path),
``p_losses``/``shared_step`` (ddpm.py:1093-1096, 1286-1319), and DDIM
sampling with CFG (ldm/models/diffusion/ddim.py:22-504 /
SD/eval-scripts/generate-images.py).

Design: a frozen ``SDModules`` bundle (model defs) + a params dict
{"unet", "vae", "clip"}; every op is a pure jittable function. The unused
~8.5k LoC of CompVis ballast (LatentUpscale/Inpaint/… ddpm.py:2004-2583) is
deliberately NOT reproduced.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from salun.diffusion.sampling import generalized_steps, ldm_uniform_timesteps
from salun.diffusion.schedules import DiffusionSchedule

from .clip_text import CLIPTextConfig, CLIPTextModel, tokenize
from .unet import SDUNet, SDUNetConfig
from .vae import AutoencoderKL, VAEConfig


def sd_schedule(num_timesteps: int = 1000, linear_start: float = 0.00085,
                linear_end: float = 0.012) -> DiffusionSchedule:
    """ldm 'linear' schedule = linspace in √β space (util.py:21-45),
    i.e. the DDPM 'quad' schedule with SD's endpoints."""
    return DiffusionSchedule.create(
        beta_schedule="quad", beta_start=linear_start, beta_end=linear_end,
        num_diffusion_timesteps=num_timesteps, var_type="fixedsmall",
    )


@dataclass(frozen=True)
class SDModules:
    unet: SDUNet
    vae: AutoencoderKL
    clip: CLIPTextModel
    schedule: DiffusionSchedule
    scale_factor: float = 0.18215

    @classmethod
    def create(cls, unet_cfg: Optional[SDUNetConfig] = None,
               vae_cfg: Optional[VAEConfig] = None,
               clip_cfg: Optional[CLIPTextConfig] = None,
               num_timesteps: int = 1000, linear_start: float = 0.00085,
               linear_end: float = 0.012):
        unet_cfg = unet_cfg or SDUNetConfig()
        vae_cfg = vae_cfg or VAEConfig()
        clip_cfg = clip_cfg or CLIPTextConfig()
        return cls(
            unet=SDUNet(unet_cfg), vae=AutoencoderKL(vae_cfg),
            clip=CLIPTextModel(clip_cfg),
            schedule=sd_schedule(num_timesteps, linear_start, linear_end),
            scale_factor=vae_cfg.scale_factor,
        )

    # ------------------------------------------------------------ stages

    def init(self, key, image_size: int = 64):
        # jitted: eager flax init dispatches one tiny op per layer — minutes
        # for the 860M-param stack over a remote-execution backend
        @partial(jax.jit, static_argnums=1)
        def _init(key, image_size):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            zc = self.vae.cfg.z_channels
            unet_p = self.unet.init(
                k1, jnp.zeros((1, image_size, image_size, zc)),
                jnp.zeros((1,)),
                jnp.zeros((1, self.clip.cfg.max_length,
                           self.clip.cfg.hidden_size)),
            )["params"]
            vae_p = self.vae.init(
                k2, jnp.zeros((1, image_size * 8, image_size * 8, 3)), k4
            )["params"]
            clip_p = self.clip.init(
                k3, jnp.zeros((1, self.clip.cfg.max_length), jnp.int32)
            )["params"]
            return {"unet": unet_p, "vae": vae_p, "clip": clip_p}

        return _init(key, image_size)

    def encode_text(self, params, input_ids):
        """Frozen CLIP context (ddpm.py get_learned_conditioning)."""
        return self.clip.apply({"params": params["clip"]}, input_ids)

    def encode_image(self, params, images, key):
        """[−1,1] NHWC → scaled latent sample (get_input, ddpm.py:913-973)."""
        z = self.vae.apply({"params": params["vae"]}, images, key,
                           method=AutoencoderKL.encode_sample)
        return z * self.scale_factor

    def encode_image_moments(self, params, images):
        """Posterior moments (mean, logvar) of the first stage — the
        DETERMINISTIC part of get_input (ddpm.py:913-973): the reference
        re-runs the full 512² VAE encode on the same images every epoch,
        but only the posterior noise draw is fresh. Cache these once per
        image and use :meth:`latent_from_moments` per step (flag-gated in
        the trainers; tests pin equality to float rounding)."""
        return self.vae.apply({"params": params["vae"]}, images,
                              method=AutoencoderKL.encode_moments)

    def latent_from_moments(self, moments, key):
        """Fresh scaled posterior draw from cached moments — same math and
        key usage as ``encode_image(params, images, key)`` when ``moments =
        encode_image_moments(params, images)`` (agrees to float rounding
        across the two compiled programs)."""
        mean, logvar = moments
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)
        return z * self.scale_factor

    def decode_latent(self, params, z):
        return self.vae.apply({"params": params["vae"]},
                              z / self.scale_factor,
                              method=AutoencoderKL.decode)

    def apply_model(self, params, z_t, t, context):
        """eps prediction (DiffusionWrapper crossattn path, ddpm.py:1961)."""
        return self.unet.apply({"params": params["unet"]}, z_t,
                               t.astype(jnp.float32), context)

    def q_sample(self, z0, t, noise):
        a = jnp.asarray(self.schedule.alphas_cumprod)[t].reshape(-1, 1, 1, 1)
        return jnp.sqrt(a) * z0 + jnp.sqrt(1.0 - a) * noise

    # ------------------------------------------------------------ losses

    def p_losses(self, params, z0, context, t, noise):
        """loss_simple: per-sample-mean eps MSE, batch mean
        (ddpm.py:1286-1319 with l_simple_weight=1, elbo weight 0)."""
        z_t = self.q_sample(z0, t, noise)
        out = self.apply_model(params, z_t, t, context)
        return jnp.square(noise - out).mean(axis=(1, 2, 3)).mean()

    def shared_step(self, params, images, input_ids, key):
        """get_input + p_losses (ddpm.py:1093-1096)."""
        ke, kt, kn = jax.random.split(key, 3)
        z0 = self.encode_image(params, images, ke)
        context = self.encode_text(params, input_ids)
        t = jax.random.randint(kt, (images.shape[0],), 0,
                               self.schedule.num_timesteps)
        noise = jax.random.normal(kn, z0.shape)
        return self.p_losses(params, z0, context, t, noise)

    def shared_step_cached(self, params, moments, context, key):
        """``shared_step`` from cached posterior moments + cached CLIP
        context — bitwise equal to the uncached path for the same key
        (identical key-split chain: ke draws the posterior sample)."""
        ke, kt, kn = jax.random.split(key, 3)
        z0 = self.latent_from_moments(moments, ke)
        t = jax.random.randint(kt, (z0.shape[0],), 0,
                               self.schedule.num_timesteps)
        noise = jax.random.normal(kn, z0.shape)
        return self.p_losses(params, z0, context, t, noise)

    # ------------------------------------------------------------ sampling

    def cfg_eps_fn(self, params, cond_ctx, uncond_ctx, guidance: float):
        """One stacked forward for cond+uncond (TPU CFG trick), combined as
        e_∅ + g·(e_c − e_∅) (generate-images.py / DDIMSampler CFG)."""

        def eps_fn(z, t):
            b = z.shape[0]
            z2 = jnp.concatenate([z, z], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            ctx = jnp.concatenate([cond_ctx, uncond_ctx], axis=0)
            e2 = self.apply_model(params, z2, t2, ctx)
            e_c, e_u = e2[:b], e2[b:]
            return e_u + guidance * (e_c - e_u)

        return eps_fn

    def initial_latents(self, key, n: int, image_size: int):
        """The z drawn by :meth:`sample` for this key — exposed so callers
        can precompute per-prompt-row latents (each CSV row has its own
        evaluation_seed, generate-images.py) and batch several rows into
        one sharded sampling call (cli/sd_generate_images.py --dp)."""
        _, nk = jax.random.split(key)
        return jax.random.normal(
            nk, (n, image_size, image_size, self.vae.cfg.z_channels))

    def sample(self, params, key, prompts, *, negative_prompts=None,
               guidance: float = 7.5, steps: int = 50, image_size: int = 64,
               eta: float = 0.0, return_latents: bool = False,
               sampler: str = "ddim", initial_latents=None):
        """Text → images in [0,1] via DDIM or PLMS
        (ddim.py / plms.py / generate-images.py). ``initial_latents``
        overrides the internally drawn z (see :meth:`initial_latents`);
        the chain shards over an active --dp mesh's data axis."""
        n = len(prompts)
        max_len = self.clip.cfg.max_length
        ids_c = jnp.asarray(tokenize(prompts, max_len))
        ids_u = jnp.asarray(tokenize(negative_prompts or [""] * n, max_len))
        ctx_c = self.encode_text(params, ids_c)
        ctx_u = self.encode_text(params, ids_u)

        T = self.schedule.num_timesteps
        # ldm 'uniform' discretization: +1-shifted grid, ᾱ₀ at the boundary
        # (ddim.py make_schedule / util.py make_ddim_timesteps). The fork's
        # DDIMSampler additionally drops the LAST grid entry
        # (timesteps[:t_start] with t_start=-1, ddim.py:224); PLMSSampler
        # has no t_start and walks the full grid (plms.py:190-216) —
        # tests/test_arch_parity.py::test_sd_sampler_matches_reference.
        seq = ldm_uniform_timesteps(T, steps)
        if sampler == "ddim":
            seq = seq[:-1]
        final_ab = float(self.schedule.alphas_cumprod[0])
        key, nk = jax.random.split(key)
        if initial_latents is None:
            z = jax.random.normal(
                nk, (n, image_size, image_size, self.vae.cfg.z_channels)
            )
        else:
            z = initial_latents
        from salun.dist import context as dist_ctx

        z = dist_ctx.constrain_batch(z)
        eps_fn = self.cfg_eps_fn(params, ctx_c, ctx_u, guidance)
        if sampler == "plms":
            from salun.diffusion.sampling import plms_steps

            z, _ = plms_steps(eps_fn, z, seq, self.schedule,
                              final_alpha_bar=final_ab)
        else:
            z, _ = generalized_steps(eps_fn, z, seq, self.schedule, eta=eta,
                                     key=key, final_alpha_bar=final_ab)
        if return_latents:
            return z
        img = self.decode_latent(params, z)
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)

    def partial_sample_latent(self, params, key, ctx, *, t_target: int,
                              steps: int, image_size: int,
                              guidance: float = 0.0, uncond_ctx=None):
        """Denoise from pure noise down to (not through) timestep
        ``t_target`` — the ESD partial-denoise trick
        (SD/train-scripts/train-esd.py:240-291, quick_sample_till_t:
        ddim_sampling breaks when index+1 == till, ddim.py:280-281, so the
        chain STOPS with z still at noise level ≈ t_target). The last
        executed transition lands on the grid point at/above ``t_target``;
        the remaining steps never run.

        Grid parity with the fork's DDIMSampler (same as
        trainers._partial_denoise): the ldm 'uniform' +1-shifted grid with
        the LAST entry dropped (``timesteps[:t_start]``, t_start=-1,
        ddim.py:224)."""
        from salun.diffusion.sampling import ldm_uniform_timesteps

        T = self.schedule.num_timesteps
        seq = [s for s in ldm_uniform_timesteps(T, steps)[:-1]
               if s >= t_target]
        n = ctx.shape[0]
        key, nk = jax.random.split(key)
        z = jax.random.normal(
            nk, (n, image_size, image_size, self.vae.cfg.z_channels)
        )
        if len(seq) < 2:   # nothing above the target: pure noise
            return z
        if guidance and uncond_ctx is not None:
            eps_fn = self.cfg_eps_fn(params, ctx, uncond_ctx, guidance)
        else:
            def eps_fn(zz, tt):
                return self.apply_model(params, zz, tt, ctx)

        # manual pair walk: transitions (seq[k] → seq[k-1]) ending AT
        # seq[0] — generalized_steps would append the (seq[0] → −1)
        # boundary transition and fully denoise past the target
        ts = jnp.asarray(list(reversed(seq[1:])), jnp.int32)
        ts_next = jnp.asarray(list(reversed(seq[:-1])), jnp.int32)
        sched = self.schedule

        def body(carry, t_pair):
            zt, k = carry
            i, j = t_pair
            t = jnp.full((n,), i, jnp.int32)
            at = sched.alpha_bar(t).reshape(-1, 1, 1, 1)
            at_next = sched.alpha_bar(
                jnp.full((n,), j, jnp.int32)).reshape(-1, 1, 1, 1)
            et = eps_fn(zt, t.astype(jnp.float32))
            x0_t = (zt - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
            z_next = jnp.sqrt(at_next) * x0_t + jnp.sqrt(1.0 - at_next) * et
            return (z_next, k), None

        (z, _), _ = jax.lax.scan(body, (z, key),
                                 jnp.stack([ts, ts_next], axis=1))
        return z
