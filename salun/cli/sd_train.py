"""SD concept-erasure CLI — one driver for all six train-scripts.

Parity (each reference script is a subcommand):
- generate_mask     (SD/train-scripts/generate_mask.py)
- random_label      (random_label.py — SalUn class forgetting)
- gradient_ascent   (gradient_ascent.py)
- nsfw_removal      (nsfw_removal.py)
- proximal          (proximal_gradient.py)
- esd               (train-esd.py)

Usage:
  python -m salun.cli.sd_train random_label --class_to_forget 0 \
      --ckpt_path sd-v1-4.ckpt --train_method full --alpha 0.5 \
      --epochs 5 --lr 1e-5 --mask_path mask/0/with_0.5.pt
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from salun import ckpt as ckpt_store
from salun.sd import SDModules, data as sd_data, import_compvis, \
    load_compvis_state_dict, tokenize
from salun.sd.trainers import (
    make_esd_step, make_gradient_ascent_step, make_random_label_step,
    make_sd_optimizer, proximal_ratio, proximal_shrink, sd_generate_mask,
    trainable_mask, with_mask,
)
from salun.utils.rng import seed_all
from salun.utils.tree import tree_size


def _common(p):
    p.add_argument("--config", type=str, default=None,
                   help="v1-inference.yaml-style model config (reference "
                        "SD/configs/stable-diffusion/v1-inference.yaml); "
                        "default = built-in sd-v1 dataclass defaults")
    p.add_argument("--ckpt_path", type=str, default=None,
                   help="CompVis sd-v1-4.ckpt (imported) or our orbax ckpt")
    p.add_argument("--data", type=str, default="./data")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--train_method", type=str, default="full")
    p.add_argument("--mask_path", type=str, default=None)
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--save_dir", type=str, default="results/sd")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel device count (0/1 = single device): "
                        "batches shard over a (data,) mesh, state "
                        "replicates, GSPMD all-reduces")
    p.add_argument("--fsdp", action="store_true",
                   help="with --dp: shard U-Net params, Adam moments, and "
                        "the saliency mask over the data axis (ZeRO-3, "
                        "salun/dist/fsdp.py) — 859.5M-param SD v1 state "
                        "fits a v5e-8 comfortably only sharded")
    p.add_argument("--remat", action="store_true",
                   help="block-level gradient checkpointing on the U-Net "
                        "(the reference's use_checkpoint: True; applies "
                        "when no --config yaml sets it). Needed to fit "
                        "the bs-8 recipe in 16 GB HBM.")
    p.add_argument("--cache_vae_moments", action="store_true",
                   help="precompute the forget set's VAE posterior "
                        "moments + prompt CLIP contexts once and skip the "
                        "per-step frozen-stage re-encodes (the reference "
                        "re-encodes each Df image 10x over the 5-epoch "
                        "recipe, ddpm.py:913-973). Numerically equal to "
                        "the default path (tests/test_sd.py); off by "
                        "default for strict recompute parity. "
                        "random_label/proximal/nsfw_removal only.")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="SalUn-TPU SD trainers")
    sub = p.add_subparsers(dest="cmd", required=True)

    gm = sub.add_parser("generate_mask")
    _common(gm)
    gm.add_argument("--class_to_forget", type=int, default=0)
    gm.add_argument("--c_guidance", type=float, default=7.5)
    gm.add_argument("--threshold", type=float, default=0.5)
    gm.add_argument("--num_samples", type=int, default=64)

    for name in ("random_label", "gradient_ascent"):
        q = sub.add_parser(name)
        _common(q)
        q.add_argument("--class_to_forget", type=int, default=0)
        q.add_argument("--epochs", type=int, default=5)

    nz = sub.add_parser("nsfw_removal")
    _common(nz)
    nz.add_argument("--forget_dir", type=str, default="data/nsfw")
    nz.add_argument("--remain_dir", type=str, default="data/not-nsfw")
    nz.add_argument("--epochs", type=int, default=1)

    pr = sub.add_parser("proximal")
    _common(pr)
    pr.add_argument("--class_to_forget", type=int, default=0)
    pr.add_argument("--epochs", type=int, default=5)
    pr.add_argument("--mask_ratio", type=float, default=0.5)

    es = sub.add_parser("esd")
    _common(es)
    es.add_argument("--prompt", type=str, required=True)
    es.add_argument("--iterations", type=int, default=1000)
    es.add_argument("--start_guidance", type=float, default=3.0)
    es.add_argument("--negative_guidance", type=float, default=1.0)
    es.add_argument("--ddim_steps", type=int, default=50)

    return p.parse_args(argv)


def load_params(modules: SDModules, args, key):
    if args.ckpt_path and args.ckpt_path.endswith(".ckpt"):
        sd = load_compvis_state_dict(args.ckpt_path)
        templates = modules.init(key, image_size=args.image_size // 8)
        return import_compvis(sd, templates)
    if args.ckpt_path:
        return ckpt_store.restore(args.ckpt_path)["params"]
    print("WARNING: no --ckpt_path, using random init (pipeline check only)")
    return modules.init(key, image_size=args.image_size // 8)


def load_unet_mask(args, unet_params):
    """Saliency mask as an int8 0/1 pytree: the 860M-entry mask costs
    0.86 GB instead of 3.44 GB f32 in HBM (mask_grads casts at use, so
    masking is bitwise-identical; 16 GB v5e chips need the headroom)."""
    if not args.mask_path:
        return None
    if args.mask_path.endswith((".pt", ".pth")):
        import torch

        from salun.sd.import_ckpt import _place, map_unet_key
        from salun.utils.tree import flatten_names, tree_from_flat

        md = torch.load(args.mask_path, map_location="cpu",
                        weights_only=False)
        flat = {}
        for name, t in md.items():
            name = name.split("model.diffusion_model.")[-1]
            base, leaf = name.rsplit(".", 1)
            _place(flat, map_unet_key(base), np.asarray(t.float()), leaf)
        tmpl = flatten_names(unet_params)
        out = {k: jnp.asarray(flat[k]).astype(jnp.int8) if k in flat
               else jnp.ones_like(v, jnp.int8) for k, v in tmpl.items()}
        return tree_from_flat(out)
    mask = ckpt_store.restore(args.mask_path)["mask"]
    return jax.tree.map(lambda m: jnp.asarray(m).astype(jnp.int8), mask)


def main(argv=None):
    args = parse_args(argv)
    from salun.dist import context as dist_ctx

    mesh = dist_ctx.mesh_from_flags(args.dp)
    with dist_ctx.activate(mesh):
        return _main(args, mesh)


def _main(args, mesh):
    from salun.dist import context as dist_ctx

    os.makedirs(args.save_dir, exist_ok=True)
    seed_all(args.seed)
    key = jax.random.PRNGKey(args.seed)
    if getattr(args, "config", None):
        # the yaml's use_checkpoint maps to SDUNetConfig.remat
        # (v1-inference.yaml trains with True)
        from salun.sd.config import modules_from_yaml

        modules = modules_from_yaml(args.config)
    else:
        from salun.sd import SDUNetConfig

        modules = SDModules.create(
            SDUNetConfig(remat=getattr(args, "remat", False)))
    params = load_params(modules, args, key)
    if mesh is not None:
        params = dist_ctx.place_replicated(params, mesh)
    latent = args.image_size // 8

    if args.cmd == "generate_mask":
        ds = sd_data.load_imagenette(args.data, args.image_size)
        forget, _ = sd_data.forget_remain_split(ds, args.class_to_forget)
        n = min(args.num_samples, len(forget))
        imgs = sd_data.to_pm1(forget.data[:n])
        prompts = [sd_data.DESCRIPTIONS[args.class_to_forget]] * n
        masks = sd_generate_mask(modules, params, imgs, prompts, key,
                                 guidance=args.c_guidance,
                                 batch_size=args.batch_size,
                                 thresholds=(args.threshold,))
        out = os.path.join(args.save_dir, "mask", str(args.class_to_forget))
        for t, m in masks.items():
            ckpt_store.save(os.path.join(out, f"with_{t}"), {"mask": m})
        return

    mask = load_unet_mask(args, params["unet"])
    unet0 = params["unet"]
    if args.fsdp and mesh is not None:
        # ZeRO-3: shard trainee params + frozen copy + mask BEFORE tx.init
        # so the eagerly-copied opt-state mask/moments inherit the sharding
        from salun.dist.fsdp import fsdp_pspecs, shard_fsdp

        pspecs = fsdp_pspecs(unet0, mesh)
        unet0 = shard_fsdp(unet0, mesh, pspecs)
        params = dict(params, unet=shard_fsdp(params["unet"], mesh, pspecs))
        if mask is not None:
            mask = shard_fsdp(mask, mesh, pspecs)
    elif mask is not None and mesh is not None:
        mask = dist_ctx.place_replicated(mask, mesh)
    # saliency masking rides in the optimizer state (trainers.with_mask) —
    # init AFTER wrapping so the opt-state structure matches the step's tx
    tx = with_mask(
        make_sd_optimizer(unet0, args.lr, args.train_method), mask)
    carry = (jax.tree.map(jnp.copy, unet0), tx.init(unet0))

    use_cache = (args.cache_vae_moments
                 and args.cmd in ("random_label", "proximal",
                                  "nsfw_removal"))

    def precompute_forget_cache(forget_images_u8):
        """One VAE pass over Df → per-image posterior moments (~64 KB/img
        vs 10 re-encodes over the 5-epoch recipe); bitwise-equal training
        per trainers.make_random_label_step(cached='forget')."""
        enc = jax.jit(
            lambda imgs: modules.encode_image_moments(params, imgs))
        means, logvars = [], []
        for i in range(0, len(forget_images_u8), args.batch_size):
            m, lv = enc(jnp.asarray(
                sd_data.to_pm1(forget_images_u8[i:i + args.batch_size])))
            means.append(np.asarray(m))
            logvars.append(np.asarray(lv))
        return np.concatenate(means), np.concatenate(logvars)

    if args.cmd in ("random_label", "gradient_ascent", "proximal"):
        ds = sd_data.load_imagenette(args.data, args.image_size)
        forget, remain = sd_data.forget_remain_split(ds, args.class_to_forget)
        pseudo_cls = (args.class_to_forget + 1) % 10
        step_maker = (make_gradient_ascent_step
                      if args.cmd == "gradient_ascent"
                      else make_random_label_step)
        if use_cache:
            step = make_random_label_step(modules, tx, alpha=args.alpha,
                                          cached="forget")
            f_mean, f_logvar = precompute_forget_cache(forget.data)
            ctx_table = np.asarray(modules.encode_text(
                params, jnp.asarray(tokenize(list(sd_data.DESCRIPTIONS)))))
        else:
            step = step_maker(modules, tx, alpha=args.alpha)
        theta_init = (jax.tree.map(jnp.copy, carry[0])
                      if args.cmd == "proximal" else None)
        # the reference's ratio schedule counts the WHOLE model's params
        # (frozen VAE/CLIP included as zero diffs) and a per-epoch
        # denominator of forget+remain batch counts (proximal_gradient.py:
        # 66-73,144-150); see trainers.proximal_ratio/proximal_shrink
        n_total = tree_size(params)
        n_frozen = n_total - tree_size(carry[0])
        nf_batches = max(len(forget) // args.batch_size, 1)
        nr_batches = -(-len(remain) // args.batch_size)  # ceil, DataLoader len
        steps_per_epoch = nf_batches
        rng = np.random.RandomState(args.seed)
        for epoch in range(args.epochs):
            order_f = rng.permutation(len(forget))
            order_r = rng.permutation(len(remain))
            for i in range(steps_per_epoch):
                fi = order_f[(i * args.batch_size) % len(forget):][:args.batch_size]
                ri = order_r[(i * args.batch_size) % len(remain):][:args.batch_size]
                if len(fi) < args.batch_size or len(ri) < args.batch_size:
                    continue
                f_lab = forget.targets[fi]
                r_lab = remain.targets[ri]
                if use_cache:
                    batch = dist_ctx.ingest({
                        "forget_moments": (f_mean[fi], f_logvar[fi]),
                        "forget_ctx": ctx_table[f_lab],
                        "pseudo_ctx": ctx_table[
                            np.full(len(fi), pseudo_cls)],
                        "remain_images": sd_data.to_pm1(remain.data[ri]),
                        "remain_ids": tokenize(
                            [sd_data.DESCRIPTIONS[c] for c in r_lab]),
                    })
                else:
                    batch = dist_ctx.ingest({
                        "forget_images": sd_data.to_pm1(forget.data[fi]),
                        "remain_images": sd_data.to_pm1(remain.data[ri]),
                        "forget_ids": tokenize(
                            [sd_data.DESCRIPTIONS[c] for c in f_lab]),
                        "pseudo_ids": tokenize(
                            [sd_data.DESCRIPTIONS[pseudo_cls]] * len(fi)),
                        "remain_ids": tokenize(
                            [sd_data.DESCRIPTIONS[c] for c in r_lab]),
                    })
                key, sub = jax.random.split(key)
                carry, loss = step(carry, params, batch, sub)
                if args.cmd == "proximal":
                    ratio = proximal_ratio(
                        args.mask_ratio, epoch, i, nf_batches, nr_batches,
                        args.epochs, n_total) - n_frozen
                    if ratio >= 1:
                        carry = (proximal_shrink(carry[0], theta_init,
                                                 jnp.int32(ratio)), carry[1])
            print(f"epoch {epoch} loss {float(loss):.4f}")
    elif args.cmd == "nsfw_removal":
        forget_ds = sd_data.load_image_folder(args.forget_dir, args.image_size)
        remain_ds = sd_data.load_image_folder(args.remain_dir, args.image_size)
        step = make_random_label_step(modules, tx, alpha=args.alpha,
                                      cached="forget" if use_cache else False)
        ids_nude = tokenize([sd_data.WORD_NUDE] * args.batch_size)
        ids_wear = tokenize([sd_data.WORD_WEAR] * args.batch_size)
        if use_cache:
            f_mean, f_logvar = precompute_forget_cache(forget_ds.data)
            ctx_nude = np.asarray(modules.encode_text(
                params, jnp.asarray(ids_nude)))
            ctx_wear = np.asarray(modules.encode_text(
                params, jnp.asarray(ids_wear)))
        rng = np.random.RandomState(args.seed)
        for epoch in range(args.epochs):
            order_f = rng.permutation(len(forget_ds))
            order_r = rng.permutation(len(remain_ds))
            for i in range(len(forget_ds) // args.batch_size):
                fi = order_f[i * args.batch_size:][:args.batch_size]
                ri = order_r[(i * args.batch_size) % len(remain_ds):][:args.batch_size]
                if len(ri) < args.batch_size:
                    continue
                if use_cache:
                    batch = dist_ctx.ingest({
                        "forget_moments": (f_mean[fi], f_logvar[fi]),
                        "forget_ctx": ctx_nude[:len(fi)],
                        "pseudo_ctx": ctx_wear[:len(fi)],
                        "remain_images": sd_data.to_pm1(remain_ds.data[ri]),
                        "remain_ids": ids_wear,
                    })
                else:
                    batch = dist_ctx.ingest({
                        "forget_images": sd_data.to_pm1(forget_ds.data[fi]),
                        "remain_images": sd_data.to_pm1(remain_ds.data[ri]),
                        "forget_ids": ids_nude,
                        "pseudo_ids": ids_wear,
                        "remain_ids": ids_wear,
                    })
                key, sub = jax.random.split(key)
                carry, loss = step(carry, params, batch, sub)
            print(f"epoch {epoch} loss {float(loss):.4f}")
    elif args.cmd == "esd":
        words = [w.strip() for w in args.prompt.split(",")] or [args.prompt]
        step = make_esd_step(modules, tx,
                             negative_guidance=args.negative_guidance,
                             start_guidance=args.start_guidance,
                             ddim_steps=args.ddim_steps, image_size=latent)
        ctx_0 = modules.encode_text(params, jnp.asarray(tokenize([""])))
        for i in range(args.iterations):
            word = words[i % len(words)]
            ids = jnp.asarray(tokenize([word]))
            ctx_p = modules.encode_text(params, ids)
            key, sub = jax.random.split(key)
            carry, loss = step(carry, params, ctx_p, ctx_0, ctx_p, sub)
            if (i + 1) % 100 == 0:
                print(f"iter {i} loss {float(loss):.5f}")

    new_params = dict(params, unet=carry[0])
    ckpt_store.save(os.path.join(args.save_dir, "ckpt"),
                    {"params": new_params})
    # CompVis-format export for interop (random_label.py:146-199
    # save_model writes the full model.state_dict() as a torch .pt that
    # the reference's eval tooling loads); npz fallback without torch
    from salun.sd.import_ckpt import export_compvis, export_compvis_unet

    try:
        import torch

        torch.save(
            {"state_dict": {k: torch.tensor(v) for k, v in
                            export_compvis(new_params).items()}},
            os.path.join(args.save_dir, "compvis.ckpt"))
    except ImportError:
        np.savez(os.path.join(args.save_dir, "unet_compvis.npz"),
                 **export_compvis_unet(carry[0]))


if __name__ == "__main__":
    main()
