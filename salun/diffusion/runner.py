"""DDPM workload runner — every mode of the reference's god-object
``Diffusion`` (DDPM/runners/diffusion.py:69-1039), re-cut as jitted step
functions over pytrees:

- ``train`` / ``retrain``            (diffusion.py:194-270, 399-480)
- ``train_forget``  (SA baseline: EWC + remember loss, diffusion.py:273-396)
- ``saliency_unlearn``  (SalUn: remain + {ga|rl} forget loss, masked grads,
                         diffusion.py:482-619)
- ``generate_mask``     (CFG-scaled eps loss saliency, diffusion.py:933-1039)
- ``save_fim``          (per-sample FIM over timesteps, diffusion.py:101-191)
- sampling             (sample_classes / sample_fid / sample_visualization,
                        diffusion.py:642-931)

TPU design: each mode is ONE jitted step (loss + grad + clip + mask + Adam +
EMA fused); the reverse-diffusion chains are lax.scans on device; the mask
generation reuses salun.core.mask's sharded exact top-k instead of the
double argsort.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from salun.core.mask import generate_masks
from salun.core.masked_opt import mask_grads
from salun.diffusion import (
    ConditionalUNet, DiffusionSchedule, UNetConfig, antithetic_timesteps,
    cfg_eps, data_transform, q_sample, sample_image,
)


@dataclass
class DDPMTrainConfig:
    """The training/optim blocks of the reference YAMLs
    (DDPM/configs/*.yml)."""

    n_iters: int = 1000
    batch_size: int = 128
    lr: float = 2e-4
    beta1: float = 0.9
    eps: float = 1e-8
    grad_clip: float = 1.0
    ema: bool = False
    ema_rate: float = 0.9999
    alpha: float = 1.0           # forget vs remain weight (saliency_unlearn)
    method: str = "rl"           # ga | rl
    label_to_forget: int = 0
    cond_scale: float = 2.0
    gamma: float = 1.0           # train_forget remember weight
    lmbda: float = 100.0         # train_forget EWC weight
    snapshot_freq: int = 1000
    log_freq: int = 100
    cond_drop_prob: float = 0.1
    # data.random_flip in every reference YAML (train-side loaders get
    # RandomHorizontalFlip, DDPM/datasets/__init__.py:34-46); applied on
    # device inside the steps here
    random_flip: bool = True


def make_optimizer(cfg: DDPMTrainConfig, mask=None):
    """Adam + global-norm clip (functions/__init__.py:9-28 + the runner's
    clip_grad_norm_). Optional DDPM/SD-style grad masking
    (diffusion.py:589-592)."""
    chain = [optax.clip_by_global_norm(cfg.grad_clip)]
    if mask is not None:
        chain.append(mask_grads(mask))
    chain.append(optax.adam(cfg.lr, b1=cfg.beta1, eps=cfg.eps))
    return optax.chain(*chain)



def _img01(x):
    """uint8 → [0,1] float; float passes through."""
    return x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x


def random_hflip(key, x):
    """Per-sample horizontal flip with p=0.5, on device (NHWC). Parity
    with the reference's ``transforms.RandomHorizontalFlip`` in every
    training-side loader when ``data.random_flip`` is true
    (DDPM/datasets/__init__.py:34-46)."""
    flips = jax.random.bernoulli(key, 0.5, (x.shape[0],))
    return jnp.where(flips[:, None, None, None], x[:, :, ::-1, :], x)


def saliency_from_eps_loss(eps_fn, params, forget_loader, key, schedule,
                           *, grad_clip: float, thresholds=(0.5,),
                           random_flip: bool = False, stream: bool = False,
                           jit_cache: dict = None):
    """The reference's DDPM mask-gen loop (diffusion.py:959-1039), generic
    over the eps model: per batch — antithetic t, q_sample, CFG eps,
    ``loss = (e − eps)².sum(pixels).mean(batch)``, grads clipped by global
    norm BEFORE accumulation (diffusion.py:986-991) — then |.| and exact
    global top-k thresholding.

    Batches may carry explicit ``t``/``e`` entries to replay a fixed noise
    stream (deterministic parity tests, tests/test_reference_parity.py);
    ``random_flip`` reproduces the train-loader RandomHorizontalFlip the
    reference's forget loader inherits (datasets/__init__.py:34-46).
    ``jit_cache``: caller-owned dict reusing the jitted programs across
    calls — a fresh jit wrapper per call re-deserializes the persistent-
    cache executable every time (~25 s for the scanned CIFAR program on
    the remote backend; measured r5).
    """
    T = schedule.num_timesteps

    def loss_fn(params, x01, c, t, e):
        x0 = data_transform(x01)
        xt = q_sample(x0, t, e, schedule)
        out = eps_fn(params, xt, t, c)
        return jnp.square(e - out).sum(
            axis=tuple(range(1, x0.ndim))).mean()

    clip = optax.clip_by_global_norm(grad_clip)

    # ``params`` is threaded as a jit ARGUMENT everywhere below — closure
    # capture of a concrete param tree embeds it as HLO literals in the
    # compiled program (the utils.tpu_bench rule; large literals hang or
    # overflow the TPU remote-compile request)
    def acc_math(acc, params, batch, key):
        kt, ke, kf = jax.random.split(key, 3)
        x = _img01(batch["image"])
        if random_flip:
            x = random_hflip(kf, x)
        n = x.shape[0]
        t = batch.get("t")
        if t is None:
            t = antithetic_timesteps(kt, n, T)
        e = batch.get("e")
        if e is None:
            e = jax.random.normal(ke, x.shape)
        g = jax.grad(loss_fn)(params, x, batch["label"], t, e)
        # reference clips grads before accumulating (diffusion.py:986-991)
        g, _ = clip.update(g, clip.init(params))
        return jax.tree.map(lambda a, b: a + b.astype(jnp.float32), acc, g)

    from salun.dist import context as dist_ctx

    acc = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    batches = list(forget_loader)
    if (not stream and len(batches) > 1
            and len({b["image"].shape for b in batches}) == 1):
        # fast path: the whole forget pass as ONE dispatched lax.scan —
        # per-batch dispatch round-trips dominate the streamed variant on
        # a remote backend (measured 63.5 s → ~5 s for the 39-batch CIFAR
        # recipe). Key stream is the exact split chain of the streamed
        # path (subkeys produced by the same sequential split, in-graph),
        # so both paths are bitwise-identical. dim 0 is the scan axis;
        # the batch axis (dim 1) shards over an active --dp mesh.
        import numpy as np

        stacked = dist_ctx.ingest(
            jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                         *batches), dim=1)

        jit_cache = jit_cache if jit_cache is not None else {}
        if "scanned" not in jit_cache:
            @jax.jit
            def acc_scanned(acc, params, stacked, key):
                def body(carry, batch):
                    acc, k = carry
                    k, sub = jax.random.split(k)
                    return (acc_math(acc, params, batch, sub), k), None

                (acc, _), _ = jax.lax.scan(body, (acc, key), stacked)
                return acc

            jit_cache["scanned"] = acc_scanned
        acc = jit_cache["scanned"](acc, params, stacked, key)
    else:
        jit_cache = jit_cache if jit_cache is not None else {}
        if "stream" not in jit_cache:
            jit_cache["stream"] = jax.jit(acc_math)
        acc_batch = jit_cache["stream"]
        for batch in batches:
            key, sub = jax.random.split(key)
            acc = acc_batch(acc, params, dist_ctx.ingest(batch), sub)
    abs_sal = jax.tree.map(jnp.abs, acc)
    return generate_masks(abs_sal, thresholds)


class DDPMRunner:
    def __init__(self, unet_cfg: UNetConfig, schedule: DiffusionSchedule,
                 train_cfg: DDPMTrainConfig):
        self.model = ConditionalUNet(unet_cfg)
        self.unet_cfg = unet_cfg
        self.schedule = schedule
        self.cfg = train_cfg

    # ------------------------------------------------------------ init

    def init(self, key) -> dict:
        s = self.unet_cfg.image_size

        # jitted: flax init otherwise runs eagerly, op by op — hundreds of
        # tiny dispatches, which is minutes over a remote-execution tunnel
        @jax.jit
        def _init(key):
            variables = self.model.init(
                {"params": key},
                jnp.zeros((1, s, s, self.unet_cfg.in_channels)),
                jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
                train=False, cond_drop_prob=0.0,
            )
            return variables["params"]

        return _init(key)

    # ------------------------------------------------------------ losses

    def _eps_loss(self, params, x01, c, t, e, key, cond_drop_prob, train=True):
        """Conditional eps-MSE on [0,1] images (losses.py:21-37):
        transform to [−1,1], q_sample, predict, sum-square."""
        if x01.dtype == jnp.uint8:
            x01 = x01.astype(jnp.float32) / 255.0
        x0 = data_transform(x01)
        xt = q_sample(x0, t, e, self.schedule)
        rngs = {}
        if 0.0 < cond_drop_prob < 1.0:
            rngs["cond_drop"] = jax.random.fold_in(key, 0)
        if train:
            rngs["dropout"] = jax.random.fold_in(key, 1)
        out = self.model.apply(
            {"params": params}, xt, t.astype(jnp.float32), c, train=train,
            cond_drop_prob=cond_drop_prob, rngs=rngs or None,
        )
        return jnp.square(e - out).sum(axis=(1, 2, 3)).mean()

    # ------------------------------------------------------------ train

    def make_train_step(self, tx, ema: Optional[bool] = None):
        """Standard conditional training step (diffusion.py:194-270)."""
        ema = self.cfg.ema if ema is None else ema
        T = self.schedule.num_timesteps

        @partial(jax.jit, donate_argnums=0)
        def step(carry, batch, key):
            params, opt_state, shadow = carry
            kt, ke, kl, kf = jax.random.split(key, 4)
            x = _img01(batch["image"])
            if self.cfg.random_flip:
                x = random_hflip(kf, x)
            n = x.shape[0]
            t = antithetic_timesteps(kt, n, T)
            e = jax.random.normal(ke, x.shape)

            loss, grads = jax.value_and_grad(self._eps_loss)(
                params, x, batch["label"], t, e, kl,
                self.cfg.cond_drop_prob,
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if ema:
                shadow = jax.tree.map(
                    lambda p, s: (1 - self.cfg.ema_rate) * p
                    + self.cfg.ema_rate * s, params, shadow)
            return (params, opt_state, shadow), loss

        return step

    # ------------------------------------------------ saliency_unlearn

    def make_saliency_unlearn_step(self, tx, mask=None):
        """SalUn step (diffusion.py:519-595): remain loss + forget loss
        (ga: −loss | rl: MSE(out, pseudo-class out.detach())), total =
        forget + α·remain, clip, grad-mask, Adam."""
        T = self.schedule.num_timesteps
        method = self.cfg.method
        alpha = self.cfg.alpha
        pseudo_label = (self.cfg.label_to_forget + 1) % self.unet_cfg.n_classes

        def loss_fn(params, remain, forget, key):
            k1, k2, k3, k4, k5, kf1, kf2 = jax.random.split(key, 7)
            remain_img = _img01(remain["image"])
            if self.cfg.random_flip:
                remain_img = random_hflip(kf1, remain_img)
            n_r = remain_img.shape[0]
            t_r = antithetic_timesteps(k1, n_r, T)
            e_r = jax.random.normal(k2, remain_img.shape)
            remain_loss = self._eps_loss(
                params, remain_img, remain["label"], t_r, e_r, k3,
                self.cfg.cond_drop_prob,
            )

            forget_img = _img01(forget["image"])
            if self.cfg.random_flip:
                forget_img = random_hflip(kf2, forget_img)
            n_f = forget_img.shape[0]
            t_f = antithetic_timesteps(k4, n_f, T)
            e_f = jax.random.normal(k5, forget_img.shape)
            if method == "ga":
                forget_loss = -self._eps_loss(
                    params, forget_img, forget["label"], t_f, e_f, k5,
                    self.cfg.cond_drop_prob,
                )
            elif method == "rl":
                x0 = data_transform(forget_img)
                xt = q_sample(x0, t_f, e_f, self.schedule)
                tf = t_f.astype(jnp.float32)
                rngs = {"cond_drop": jax.random.fold_in(k5, 0),
                        "dropout": jax.random.fold_in(k5, 1)}
                out = self.model.apply(
                    {"params": params}, xt, tf, forget["label"], train=True,
                    rngs=rngs,
                )
                pseudo_c = jnp.full_like(forget["label"], pseudo_label)
                pseudo = self.model.apply(
                    {"params": jax.lax.stop_gradient(params)}, xt, tf,
                    pseudo_c, train=True, rngs=rngs,
                )
                pseudo = jax.lax.stop_gradient(pseudo)
                forget_loss = jnp.mean(jnp.square(pseudo - out))
            else:
                raise NotImplementedError(method)
            return forget_loss + alpha * remain_loss

        @partial(jax.jit, donate_argnums=0)
        def step(carry, remain, forget, key):
            params, opt_state, shadow = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, remain, forget, key)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if self.cfg.ema:
                shadow = jax.tree.map(
                    lambda p, s: (1 - self.cfg.ema_rate) * p
                    + self.cfg.ema_rate * s, params, shadow)
            return (params, opt_state, shadow), loss

        return step

    # ------------------------------------------------ train_forget (SA)

    def make_train_forget_step(self, tx, fisher, params_mle):
        """Selective-Amnesia step (diffusion.py:273-396): forget loss on
        uniform-noise images labeled with the forgotten class + γ·remember
        loss (both cond_drop 0) + λ·EWC."""
        T = self.schedule.num_timesteps
        cfgt = self.cfg

        def loss_fn(params, remember, key):
            k1, k2, k3, k4, k5, kf = jax.random.split(key, 6)
            x_rem = _img01(remember["image"])
            if cfgt.random_flip:
                x_rem = random_hflip(kf, x_rem)
            n = x_rem.shape[0]
            t = antithetic_timesteps(k1, n, T)
            x_forget01 = jax.random.uniform(k2, x_rem.shape)  # → [−1,1] inside
            e_f = jax.random.normal(k3, x_rem.shape)
            e_r = jax.random.normal(k4, x_rem.shape)
            c_f = jnp.full((n,), cfgt.label_to_forget, jnp.int32)

            l_forget = self._eps_loss(params, x_forget01, c_f, t, e_f, k5, 0.0)
            l_rem = self._eps_loss(params, x_rem, remember["label"], t, e_r,
                                   jax.random.fold_in(k5, 7), 0.0)
            ewc = sum(
                jnp.sum(f * jnp.square(p - p0))
                for f, p, p0 in zip(jax.tree.leaves(fisher),
                                    jax.tree.leaves(params),
                                    jax.tree.leaves(params_mle))
            )
            return l_forget + cfgt.gamma * l_rem + cfgt.lmbda * ewc

        @partial(jax.jit, donate_argnums=0)
        def step(carry, remember, key):
            params, opt_state, shadow = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, remember, key)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if cfgt.ema:
                shadow = jax.tree.map(
                    lambda p, s: (1 - cfgt.ema_rate) * p + cfgt.ema_rate * s,
                    params, shadow)
            return (params, opt_state, shadow), loss

        return step

    # ------------------------------------------------ generate_mask

    def generate_mask(self, params, forget_loader, key,
                      thresholds=(0.5,), stream: bool = False):
        """Saliency from the CFG-scaled eps loss on the forget class
        (diffusion.py:959-1001), thresholded by exact global top-k.
        ``stream=True`` forces the per-batch dispatch path (the scanned
        fast path is bitwise-identical; tests pin that)."""
        cond_scale = self.cfg.cond_scale

        def eps_fn(params, xt, t, c):
            return cfg_eps(self.model, {"params": params}, xt,
                           t.astype(jnp.float32), c, cond_scale)

        # runner-owned jit cache: repeat generate_mask calls reuse the
        # compiled accumulation programs (fresh wrappers re-deserialize
        # the persistent-cache executable per call, ~25 s on the remote
        # backend — r5 bench finding)
        if not hasattr(self, "_maskgen_jit_cache"):
            self._maskgen_jit_cache = {}
        return saliency_from_eps_loss(
            eps_fn, params, forget_loader, key, self.schedule,
            grad_clip=self.cfg.grad_clip, thresholds=thresholds,
            random_flip=self.cfg.random_flip, stream=stream,
            jit_cache=self._maskgen_jit_cache)

    # ------------------------------------------------ FIM

    def compute_fim(self, params, loader, key, n_timestep_samples: int = 16):
        """Diagonal FIM (diffusion.py:101-191): E over samples/timesteps of
        squared per-sample grads of the conditional eps loss.

        The reference loops all 1000 timesteps per sample with one backward
        each (bs = #GPUs); here per-sample grads are jax.vmap(jax.grad) and
        timesteps are subsampled — set n_timestep_samples=T for the exact
        reference estimator.
        """
        T = self.schedule.num_timesteps

        def one_loss(params, x01, c, t, e):
            x0 = data_transform(x01[None])
            xt = q_sample(x0, t[None], e[None], self.schedule)
            out = self.model.apply(
                {"params": params}, xt, t[None].astype(jnp.float32),
                c[None], train=False, cond_drop_prob=0.0,
            )
            return jnp.square(e[None] - out).sum()

        grad_one = jax.grad(one_loss)

        @jax.jit
        def acc_batch(acc, total, batch, key):
            x, c = _img01(batch["image"]), batch["label"]
            n = x.shape[0]
            kt, ke, kf = jax.random.split(key, 3)
            if self.cfg.random_flip:
                x = random_hflip(kf, x)
            ts = jax.random.randint(kt, (n, n_timestep_samples), 0, T)
            es = jax.random.normal(ke, (n_timestep_samples,) + x.shape)

            def per_t(i, carry):
                acc = carry
                g = jax.vmap(grad_one, in_axes=(None, 0, 0, 0, 0))(
                    params, x, c, ts[:, i], es[i]
                )
                return jax.tree.map(
                    lambda a, gg: a + jnp.sum(jnp.square(gg), axis=0), acc, g
                )

            acc = jax.lax.fori_loop(0, n_timestep_samples, per_t, acc)
            return acc, total + n * n_timestep_samples

        from salun.dist import context as dist_ctx

        acc = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
        total = jnp.zeros((), jnp.float32)
        for batch in loader:
            key, sub = jax.random.split(key)
            acc, total = acc_batch(acc, total, dist_ctx.ingest(batch), sub)
        return jax.tree.map(lambda a: a / total, acc)

    # ------------------------------------------------ sampling

    def sample_classes(self, params, key, *, classes, n_per_class: int,
                       cond_scale: Optional[float] = None,
                       sample_type: str = "generalized",
                       timesteps: Optional[int] = None):
        """Per-class sampling (diffusion.py sample_classes/sample_fid).
        Returns images in [0,1], shape [len(classes)*n, H, W, C]."""
        cond_scale = self.cfg.cond_scale if cond_scale is None else cond_scale
        outs = []
        for c in classes:
            key, sub = jax.random.split(key)
            labels = jnp.full((n_per_class,), int(c), jnp.int32)
            x = sample_image(
                self.model, {"params": params}, self.schedule, sub,
                batch=n_per_class, image_size=self.unet_cfg.image_size,
                channels=self.unet_cfg.in_channels, classes=labels,
                cond_scale=cond_scale, sample_type=sample_type,
                timesteps=timesteps,
            )
            outs.append((x + 1.0) / 2.0)
        return jnp.clip(jnp.concatenate(outs), 0.0, 1.0)

    def sample_visualization(self, params, key, n_per_class: int = 10,
                             cond_scale: Optional[float] = None,
                             timesteps: Optional[int] = None):
        """Class-grid snapshot (diffusion.py:877-931)."""
        return self.sample_classes(
            params, key, classes=range(self.unet_cfg.n_classes),
            n_per_class=n_per_class, cond_scale=cond_scale,
            timesteps=timesteps,
        )

    def sample_trajectory(self, params, key, *, classes,
                          cond_scale: Optional[float] = None,
                          sample_type: str = "generalized",
                          timesteps: Optional[int] = None):
        """Per-step denoising chain for visualization — parity with the
        reference's trajectory dump (denoising.py:31,93 offload every x_t
        to CPU; ours is two stacked scan outputs). Returns (xs, x0_preds)
        in [0,1], each [steps, B, H, W, C]."""
        cond_scale = self.cfg.cond_scale if cond_scale is None else cond_scale
        labels = jnp.asarray(classes, jnp.int32)
        _, xs, x0s = sample_image(
            self.model, {"params": params}, self.schedule, key,
            batch=labels.shape[0], image_size=self.unet_cfg.image_size,
            channels=self.unet_cfg.in_channels, classes=labels,
            cond_scale=cond_scale, sample_type=sample_type,
            timesteps=timesteps, return_trajectory=True,
        )
        clip01 = lambda v: jnp.clip((v + 1.0) / 2.0, 0.0, 1.0)
        return clip01(xs), clip01(x0s)
