"""SD concept-erasure trainers.

Parity with the SD/train-scripts family:
- ``generate_mask``      (generate_mask.py:8-211): |Σ∇| of the negated
  CFG-combined eps-MSE on the forget prompts, UNet params only, top-50%.
- ``random_label`` SalUn (random_label.py:13-156): remain shared_step loss +
  MSE(eps(forget z_t, forget prompt), eps(forget z_t, pseudo prompt).detach()),
  total = forget + α·remain, grads masked, Adam over full/xattn subsets.
- ``gradient_ascent``    (gradient_ascent.py:14-121): −shared_step(forget) +
  α·shared_step(remain).
- ``nsfw_removal``       (nsfw_removal.py:33-323): random_label recipe with
  the fixed prompt pair nude→clothes over generated-image folders.
- ``proximal_gradient``  (proximal_gradient.py:18-383): RL + post-step
  global soft-threshold toward θ_init (mask-free SalUn) — the reference
  needs a second GPU as flat-copy scratch (proximal_gradient.py:66-73);
  here it's the sharded bisection threshold, no extra device.
- ``esd``                (train-esd.py:129-343): partial-denoise to z_t,
  teacher target e_0 − g·(e_p − e_0) from frozen params, student e_n on the
  erased prompt; the reference splits teacher/student across two GPUs —
  here both are param pytrees in one jitted step (SURVEY.md §2.5).

Trainable-parameter subsets (train-esd.py:205-236): noxattn / selfattn /
xattn / full / notime / xlayer / selflayer as pytree-path predicates
instead of name-string loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from salun.core.mask import generate_masks
from salun.dist.topk import kth_largest_threshold
from salun.utils.tree import flatten_names, tree_from_flat, tree_size

from .clip_text import tokenize
from .ldm import SDModules


# ------------------------------------------------------- trainable subsets


def _subset_pred(train_method: str):
    """flat-name predicate for each train_method (train-esd.py:205-236)."""

    def pred(name: str) -> bool:
        if train_method == "full":
            return True
        if train_method == "xattn":
            return "attn2" in name
        if train_method == "selfattn":
            return "attn1" in name
        if train_method == "noxattn":
            return not (name.startswith("out_") or "attn2" in name
                        or "time_embed" in name)
        if train_method == "notime":
            return not (name.startswith("out_") or "time_embed" in name)
        if train_method == "xlayer":
            return "attn2" in name and (
                "output_blocks_6_" in name or "output_blocks_8_" in name)
        if train_method == "selflayer":
            return "attn1" in name and (
                "input_blocks_4_" in name or "input_blocks_7_" in name)
        raise ValueError(train_method)

    return pred


def trainable_mask(unet_params, train_method: str):
    """Boolean pytree marking trainable UNet leaves."""
    pred = _subset_pred(train_method)
    flat = flatten_names(unet_params)
    return tree_from_flat({k: pred(k) for k in flat})


def make_sd_optimizer(unet_params, lr: float, train_method: str = "full"):
    """Adam over the selected subset (random_label.py:46-56); frozen leaves
    get zero updates and no moment state (optax.masked)."""
    tmask = trainable_mask(unet_params, train_method)
    not_tmask = jax.tree.map(lambda b: not b, tmask)
    # optax.masked leaves unmasked updates untouched — explicitly zero the
    # complement so frozen leaves get exactly zero update.
    return optax.chain(
        optax.masked(optax.adam(lr), tmask),
        optax.masked(optax.set_to_zero(), not_tmask),
    )


# ----------------------------------------------------------- mask gen


def sd_generate_mask(modules: SDModules, params, forget_images, prompts,
                     key, *, guidance: float = 7.5, batch_size: int = 4,
                     thresholds=(0.5,), prompt_ids=None, null_ids=None):
    """Saliency over UNet params from loss = −MSE(noise, CFG eps)
    (SD/train-scripts/generate_mask.py:34-108).

    ``prompt_ids``/``null_ids`` bypass the tokenizer with precomputed
    token-id arrays (benchmarks / callers that tokenize up front)."""
    max_len = modules.clip.cfg.max_length
    ids_c = (jnp.asarray(tokenize(prompts, max_len))
             if prompt_ids is None else jnp.asarray(prompt_ids))
    ids_u = (jnp.asarray(tokenize([""] * len(prompts), max_len))
             if null_ids is None else jnp.asarray(null_ids))
    T = modules.schedule.num_timesteps

    def loss_fn(unet_params, p_all, z0, ctx_c, ctx_u, t, noise):
        p = dict(p_all, unet=unet_params)
        z_t = modules.q_sample(z0, t, noise)
        z2 = jnp.concatenate([z_t, z_t])
        t2 = jnp.concatenate([t, t])
        ctx = jnp.concatenate([ctx_c, ctx_u])
        e2 = modules.apply_model(p, z2, t2, ctx)
        b = z_t.shape[0]
        # (1+g)·e_c − g·e_∅ (generate_mask.py:60)
        eps = (1 + guidance) * e2[:b] - guidance * e2[b:]
        return -jnp.square(noise - eps).mean()

    # ``p`` is a jit ARGUMENT — closure capture would embed the 4.3 GB
    # param dict as HLO literals, overflowing the TPU remote-compile
    # request (utils.tpu_bench rule; measured as HTTP 413 in r5). ``acc``
    # is DONATED: un-donated, every batch allocates a fresh 3.44 GB f32
    # accumulator (measured ~3.3 s/batch of allocator churn at bs 8).
    @partial(jax.jit, donate_argnums=0)
    def acc_batch(acc, p, imgs, idx_c, idx_u, key):
        k1, k2, k3 = jax.random.split(key, 3)
        z0 = modules.encode_image(p, imgs, k1)
        ctx_c = modules.encode_text(p, idx_c)
        ctx_u = modules.encode_text(p, idx_u)
        t = jax.random.randint(k2, (imgs.shape[0],), 0, T)
        noise = jax.random.normal(k3, z0.shape)
        g = jax.grad(loss_fn)(p["unet"], p, z0, ctx_c, ctx_u, t, noise)
        return jax.tree.map(lambda a, b_: a + b_.astype(jnp.float32), acc, g)

    acc = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                       params["unet"])
    from salun.dist import context as dist_ctx

    n = len(forget_images)
    for i in range(0, n, batch_size):
        key, sub = jax.random.split(key)
        imgs = dist_ctx.ingest(forget_images[i : i + batch_size])
        m = imgs.shape[0]
        acc = acc_batch(acc, params, imgs,
                        ids_c[i : i + m] if len(ids_c) == n else ids_c[:m],
                        ids_u[:m], sub)
    abs_sal = jax.tree.map(jnp.abs, acc)
    masks = generate_masks(abs_sal, thresholds)
    # int8 0/1 masks: exact (mask_grads casts at use) and the 860M-entry
    # UNet mask costs 0.86 GB instead of 3.44 GB f32 — the f32 sweep
    # output alongside the saliency accumulator would overflow a 16 GB
    # chip's HBM
    return {t: jax.tree.map(lambda m_: m_.astype(jnp.int8), m)
            for t, m in masks.items()}


# ----------------------------------------------------------- RL / GA


def with_mask(tx, mask):
    """Wrap ``tx`` with saliency grad-masking (random_label.py:132-137).

    The mask rides in the optimizer STATE (salun.core.masked_opt.mask_grads)
    — closure-capturing an 860M-param mask pytree would embed GBs of HLO
    literals into every jitted SD step. ``mask=None`` returns ``tx``.
    """
    if mask is None:
        return tx
    from salun.core.masked_opt import mask_grads

    return optax.chain(mask_grads(mask), tx)


def make_cache_batch_fn(modules: SDModules, mode: str = "all"):
    """Precompute the deterministic frozen-stage outputs of a random_label
    batch: VAE posterior moments per image set + CLIP contexts per prompt
    set (both are pure functions of frozen params — the reference recomputes
    them every step/epoch, ddpm.py:913-973). The returned dict feeds
    ``make_random_label_step(..., cached=mode)``.

    ``mode="forget"`` caches only the forget side and passes the remain
    images/ids through raw — the right choice for the 5-epoch reference
    recipe, where each Df image is re-encoded 10× (forget + pseudo × 5
    epochs) but each remain batch is drawn at most ONCE from the cycling
    remain loader (random_label.py:66-77), so remain caching has no reuse.
    """

    @jax.jit
    def cache(frozen, batch):
        out = {
            "forget_moments": modules.encode_image_moments(
                frozen, batch["forget_images"]),
            "forget_ctx": modules.encode_text(frozen, batch["forget_ids"]),
            "pseudo_ctx": modules.encode_text(frozen, batch["pseudo_ids"]),
        }
        if mode == "all":
            out["remain_moments"] = modules.encode_image_moments(
                frozen, batch["remain_images"])
            out["remain_ctx"] = modules.encode_text(
                frozen, batch["remain_ids"])
        else:
            out["remain_images"] = batch["remain_images"]
            out["remain_ids"] = batch["remain_ids"]
        return out

    return cache


def make_random_label_step(modules: SDModules, tx, alpha: float = 0.5,
                           cached=False):
    """certain_label step (random_label.py:66-143). Saliency masking is
    carried by ``tx`` (build it with ``with_mask``).

    ``cached``: False (default, strict reference recompute), ``"forget"``
    (forget-side moments/contexts precomputed, remain raw — the payoff
    mode for the 5-epoch recipe, see ``make_cache_batch_fn``), or
    ``"all"``/True. Cached batches carry precomputed VAE posterior moments
    + CLIP contexts (``make_cache_batch_fn``) instead of raw images/ids —
    the re-encoded frozen stages collapse to posterior noise draws. Same
    math and same key-split chain as the uncached path (moments are
    deterministic), so losses/updates agree to float rounding — pinned by
    tests/test_sd.py::test_cached_step_matches_uncached.
    """
    T = modules.schedule.num_timesteps
    cached = {True: "all", False: ""}.get(cached, cached)

    def loss_fn(unet_params, frozen, batch, key):
        params = dict(frozen, unet=unet_params)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        if cached:
            if cached == "all":
                remain_loss = modules.shared_step_cached(
                    params, batch["remain_moments"], batch["remain_ctx"], k1)
            else:
                remain_loss = modules.shared_step(
                    params, batch["remain_images"], batch["remain_ids"], k1)
            # two independent posterior draws from the same cached moments
            # — exactly the reference's double get_input (see below)
            z_f = modules.latent_from_moments(batch["forget_moments"], k2)
            z_p = modules.latent_from_moments(batch["forget_moments"], k5)
            ctx_f, ctx_p = batch["forget_ctx"], batch["pseudo_ctx"]
        else:
            remain_loss = modules.shared_step(
                params, batch["remain_images"], batch["remain_ids"], k1)

            # the reference calls get_input TWICE on the same forget images
            # (random_label.py:104-109) — two independent VAE-posterior
            # samples feed the forget and pseudo forwards (same t and
            # q_sample noise)
            z_f = modules.encode_image(params, batch["forget_images"], k2)
            z_p = modules.encode_image(params, batch["forget_images"], k5)
            ctx_f = modules.encode_text(params, batch["forget_ids"])
            ctx_p = modules.encode_text(params, batch["pseudo_ids"])
        t = jax.random.randint(k3, (z_f.shape[0],), 0, T)
        noise = jax.random.normal(k4, z_f.shape)
        out = modules.apply_model(params, modules.q_sample(z_f, t, noise),
                                  t, ctx_f)
        pseudo = jax.lax.stop_gradient(
            modules.apply_model(params, modules.q_sample(z_p, t, noise),
                                t, ctx_p))
        forget_loss = jnp.mean(jnp.square(out - pseudo))
        return forget_loss + alpha * remain_loss

    @partial(jax.jit, donate_argnums=0)
    def step(carry, frozen, batch, key):
        unet_params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(unet_params, frozen, batch,
                                                  key)
        updates, opt_state = tx.update(grads, opt_state, unet_params)
        unet_params = optax.apply_updates(unet_params, updates)
        return (unet_params, opt_state), loss

    return step


def make_gradient_ascent_step(modules: SDModules, tx, alpha: float = 0.5):
    """−shared_step(forget) + α·shared_step(remain)
    (gradient_ascent.py:14-121). Masking rides in ``tx`` (``with_mask``)."""

    def loss_fn(unet_params, frozen, batch, key):
        params = dict(frozen, unet=unet_params)
        k1, k2 = jax.random.split(key)
        forget = modules.shared_step(params, batch["forget_images"],
                                     batch["forget_ids"], k1)
        remain = modules.shared_step(params, batch["remain_images"],
                                     batch["remain_ids"], k2)
        return -forget + alpha * remain

    @partial(jax.jit, donate_argnums=0)
    def step(carry, frozen, batch, key):
        unet_params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(unet_params, frozen, batch,
                                                  key)
        updates, opt_state = tx.update(grads, opt_state, unet_params)
        unet_params = optax.apply_updates(unet_params, updates)
        return (unet_params, opt_state), loss

    return step


# nsfw_removal = random_label with fixed prompt pair (nsfw_removal.py:83-104)
make_nsfw_removal_step = make_random_label_step


# ----------------------------------------------------------- proximal


def proximal_ratio(mask_ratio: float, epoch: int, step_in_epoch: int,
                   n_forget_batches: int, n_remain_batches: int,
                   epochs: int, n_total_params: int) -> int:
    """The reference's decaying shrink-count schedule
    (proximal_gradient.py:144-150): ``ratio = int(mask_ratio ·
    (total − cur)/total · n_params)`` where ``total = epochs·(len(forget_dl)
    + len(remain_dl))`` but the step counter only advances per *forget*
    batch, and ``n_params`` counts the WHOLE LatentDiffusion
    (``model.parameters()`` — UNet + frozen VAE + frozen CLIP)."""
    total = epochs * (n_forget_batches + n_remain_batches)
    cur = epoch * (n_forget_batches + n_remain_batches) + step_in_epoch + 1
    return int(mask_ratio * ((total - cur) / total) * n_total_params)


@partial(jax.jit, donate_argnums=0)
def proximal_shrink(unet_params, theta_init, ratio):
    """Global soft-threshold toward θ_init (proximal_gradient.py:144-180):
    τ = the ``ratio``-th smallest |θ−θ₀| — exact bisection threshold over
    the UNet pytree, no flat copy / second-device scratch.

    The reference ranks over the WHOLE model's flattened parameters
    (``model.parameters()``, proximal_gradient.py:66-73,158-167), where the
    frozen VAE/CLIP leaves contribute exact-zero diffs that occupy the
    bottom of the ranking; pass ``ratio = ratio_full − n_frozen_params`` to
    reproduce that ranking over the UNet-only pytree (zeros inside the UNet
    tree itself, e.g. an untrained xattn complement, still participate
    here exactly as they do in the reference's concat). ``ratio < 1`` in
    the reference means τ = 0, which leaves every parameter unchanged —
    callers skip the shrink in that case."""
    diffs = jax.tree.map(lambda p, t0: (p - t0).astype(jnp.float32),
                         unet_params, theta_init)
    n = tree_size(diffs)
    k_largest = jnp.maximum(n - ratio + 1, 1)
    tau = kth_largest_threshold(jax.tree.map(jnp.abs, diffs), k_largest)

    def shrink(p, t0, d):
        moved = p.astype(jnp.float32) - jnp.sign(d) * tau
        return jnp.where(jnp.abs(d) > tau, moved,
                         t0.astype(jnp.float32)).astype(p.dtype)

    return jax.tree.map(shrink, unet_params, theta_init, diffs)


# ----------------------------------------------------------- ESD


def make_esd_step(modules: SDModules, tx,
                  negative_guidance: float = 1.0,
                  start_guidance: float = 3.0, ddim_steps: int = 50,
                  image_size: int = 64):
    """ESD step (train-esd.py:270-311): sample z_t from the *student* with
    the concept prompt (no grad), targets from the *frozen teacher*:
    e_target = e_0 − g·(e_p − e_0); loss = MSE(e_n, e_target)."""
    T = modules.schedule.num_timesteps

    def step(carry, frozen_params, ctx_p, ctx_0, ctx_n, key):
        unet_params, opt_state = carry
        k1, k2, k3 = jax.random.split(key, 3)
        # t_enc: DDIM step index then a DDPM timestep inside that bucket.
        # The bucket edges use python round() semantics (half-to-even), not
        # floor: og_num = round((t_enc/ddim_steps)·T) (train-esd.py:279-282).
        t_enc = jax.random.randint(k1, (), 0, ddim_steps)
        og = jnp.round(t_enc.astype(jnp.float32) / ddim_steps * T
                       ).astype(jnp.int32)
        og_lim = jnp.round((t_enc + 1).astype(jnp.float32) / ddim_steps * T
                           ).astype(jnp.int32)
        t_ddpm = jax.random.randint(k2, (1,), og, jnp.maximum(og_lim, og + 1))

        student = dict(frozen_params, unet=unet_params)
        z = _partial_denoise(modules, student, ctx_p, t_enc, ddim_steps,
                             image_size, start_guidance, ctx_0, k3)
        z = jax.lax.stop_gradient(z)

        e_0 = jax.lax.stop_gradient(
            modules.apply_model(frozen_params, z, t_ddpm, ctx_0))
        e_p = jax.lax.stop_gradient(
            modules.apply_model(frozen_params, z, t_ddpm, ctx_p))
        target = e_0 - negative_guidance * (e_p - e_0)

        def loss_fn(up):
            e_n = modules.apply_model(dict(frozen_params, unet=up), z,
                                      t_ddpm, ctx_n)
            return jnp.mean(jnp.square(e_n - target))

        loss, grads = jax.value_and_grad(loss_fn)(unet_params)
        updates, opt_state = tx.update(grads, opt_state, unet_params)
        unet_params = optax.apply_updates(unet_params, updates)
        return (unet_params, opt_state), loss

    return jax.jit(step, donate_argnums=0)


def _partial_denoise(modules, params, ctx, t_enc, ddim_steps, image_size,
                     guidance, ctx_0, key):
    """Denoise from T down to DDIM step t_enc (quick_sample_till_t,
    train-esd.py:240-252) — fixed-length scan with masked tail steps so the
    traced shape is static.

    Grid parity with the reference fork's DDIMSampler: the ldm 'uniform'
    +1-shifted grid with the LAST entry dropped (``timesteps[:t_start]``
    with t_start=-1, ddim.py:224) and ᾱ₀ at the boundary; the loop breaks
    after executing grid index ``till`` (= t_enc, ddim.py:280-281), here
    expressed as a mask on the scanned steps."""
    from salun.diffusion.sampling import _seq_pairs, ldm_uniform_timesteps

    T = modules.schedule.num_timesteps
    step_size = T // ddim_steps
    seq = ldm_uniform_timesteps(T, ddim_steps)[:-1]
    ts, ts_next = _seq_pairs(seq)
    n = ctx.shape[0]
    key, nk = jax.random.split(key)
    z = jax.random.normal(nk, (n, image_size, image_size,
                               modules.vae.cfg.z_channels))
    eps_fn = modules.cfg_eps_fn(params, ctx, ctx_0, guidance)
    sched = modules.schedule
    final_ab = jnp.float32(sched.alphas_cumprod[0])

    def body(carry, t_pair):
        z, k = carry
        i, j = t_pair
        # grid value i = 1 + idx·step_size. The reference breaks AFTER
        # executing the index with index+1 == till (ddim.py:280-281), so
        # executed indices run down to till−1 = t_enc−1 inclusive
        # (t_enc=0 → the full chain, with ᾱ₀ at the −1 boundary).
        active = i >= 1 + (t_enc - 1) * step_size
        t = jnp.full((n,), i, jnp.int32)
        at = sched.alpha_bar(t).reshape(-1, 1, 1, 1)
        at_next = sched.alpha_bar(jnp.full((n,), j, jnp.int32)).reshape(
            -1, 1, 1, 1)
        at_next = jnp.where(j < 0, final_ab, at_next)
        et = eps_fn(z, t.astype(jnp.float32))
        x0_t = (z - et * jnp.sqrt(1 - at)) / jnp.sqrt(at)
        z_next = jnp.sqrt(at_next) * x0_t + jnp.sqrt(1 - at_next) * et
        z = jnp.where(active, z_next, z)
        return (z, k), None

    (z, _), _ = jax.lax.scan(body, (z, key),
                             jnp.stack([ts, ts_next], axis=1))
    return z
