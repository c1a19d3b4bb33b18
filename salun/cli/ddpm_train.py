"""DDPM training / unlearning driver.

Mode parity with DDPM/train.py:132-159: ``train``, ``retrain``, ``forget``
(SA, diffusion.py:273-396), ``saliency_unlearn`` (diffusion.py:482-619),
``generate_mask`` (diffusion.py:933-1039). The reference also dispatches a
``train_esd`` mode whose runner method doesn't exist — hidden by a blanket
except (train.py:147-158); here it raises loudly.

Usage:
  python -m salun.cli.ddpm_train --config configs/ddpm/cifar10_train.yml \
      --mode saliency_unlearn --method rl --label_to_forget 0 \
      --mask_path ... --ckpt_folder ...
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import jax.numpy as jnp

from salun import ckpt
from salun.cli.ddpm_config import load_config
from salun.data import ddpm_data
from salun.data.loader import BatchIterator
from salun.diffusion.runner import DDPMRunner, make_optimizer
from salun.utils.rng import seed_all


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="SalUn-TPU DDPM")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "retrain", "forget", "saliency_unlearn",
                            "generate_mask", "train_esd"])
    p.add_argument("--data", type=str, default="./data")
    p.add_argument("--ckpt_folder", type=str, default=None)
    p.add_argument("--mask_path", type=str, default=None)
    p.add_argument("--label_to_forget", type=int, default=0)
    p.add_argument("--method", type=str, default=None, choices=[None, "ga", "rl"])
    p.add_argument("--alpha", type=float, default=None)
    p.add_argument("--cond_scale", type=float, default=None)
    p.add_argument("--n_iters", type=int, default=None)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--save_dir", type=str, default="results/ddpm")
    p.add_argument("--resume", action="store_true",
                   help="resume {params, opt_state, step, ema} from "
                        "save_dir/ckpt (parity: --resume_training, "
                        "DDPM/runners/diffusion.py:213-218)")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel device count (0/1 = single device). "
                        "The product-path replacement for the reference's "
                        "DataParallel wrap of the U-Net "
                        "(DDPM/runners/diffusion.py:203,504,628): state "
                        "replicates, batches shard, GSPMD all-reduces.")
    return p.parse_args(argv)


def _load_params(runner, args, key):
    if args.ckpt_folder:
        pth = os.path.join(args.ckpt_folder, "ckpts/ckpt.pth")
        if os.path.exists(pth):
            from salun.ckpt import import_ddpm_unet, load_ddpm_states

            sd, step, ema_sd = load_ddpm_states(pth)
            template = runner.init(key)
            return import_ddpm_unet(sd, template)
        payload = ckpt.restore(os.path.join(args.ckpt_folder, "ckpt"))
        return payload["params"]
    return runner.init(key)


def main(argv=None):
    args = parse_args(argv)
    from salun.dist import context as dist_ctx

    mesh = dist_ctx.mesh_from_flags(args.dp)
    with dist_ctx.activate(mesh):
        return _main(args, mesh)


def _main(args, mesh):
    from salun.dist import context as dist_ctx

    logging.basicConfig(level=logging.INFO)
    os.makedirs(args.save_dir, exist_ok=True)
    seed_all(args.seed)
    key = jax.random.PRNGKey(args.seed)

    bundle = load_config(args.config, alpha=args.alpha, method=args.method,
                         cond_scale=args.cond_scale, n_iters=args.n_iters)
    bundle.train.label_to_forget = args.label_to_forget
    runner = DDPMRunner(bundle.unet, bundle.schedule, bundle.train)
    cfgt = bundle.train

    train_ds = ddpm_data.get_dataset(bundle.dataset, args.data, train=True,
                                     image_size=bundle.unet.image_size)
    params = _load_params(runner, args, key)
    if mesh is not None:
        params = dist_ctx.place_replicated(params, mesh)

    if args.mode == "generate_mask":
        _, forget = ddpm_data.get_forget_dataset(train_ds, args.label_to_forget)
        loader = BatchIterator(forget, cfgt.batch_size, shuffle=True,
                               seed=args.seed)
        masks = runner.generate_mask(params, loader, key, thresholds=(0.5,))
        for t, m in masks.items():
            ckpt.save(os.path.join(args.save_dir, "mask",
                                   str(args.label_to_forget), f"with_{t}"),
                      {"mask": m})
        return

    if args.mode == "train_esd":
        # Latent defect in the reference: train.py:147-149 dispatches
        # Diffusion.train_esd which doesn't exist (train.py:156 swallows the
        # AttributeError). We fail loudly instead.
        raise NotImplementedError(
            "train_esd is dispatched but unimplemented in the reference "
            "(DDPM/train.py:147-158); use mode=saliency_unlearn --method ga."
        )

    mask = None
    if args.mask_path:
        if args.mask_path.endswith((".pt", ".pth")):
            from salun.ckpt import import_ddpm_unet  # masks use unet names

            import torch

            md = torch.load(args.mask_path, map_location="cpu",
                            weights_only=False)
            from salun.ckpt.torch_import import strip_module_prefix

            mask = import_ddpm_unet(
                {k: v.float() for k, v in strip_module_prefix(md).items()},
                params,
            )
        else:
            mask = ckpt.restore(args.mask_path)["mask"]

    if mask is not None and mesh is not None:
        mask = dist_ctx.place_replicated(mask, mesh)
    tx = make_optimizer(cfgt, mask=mask)
    opt_state = tx.init(params)
    shadow = jax.tree.map(jnp.copy, params) if cfgt.ema else None
    carry = (params, opt_state, shadow)

    start_step = 0
    resume_path = os.path.join(args.save_dir, "ckpt")
    if args.resume and ckpt.exists(resume_path):
        raw = ckpt.restore(resume_path)
        params = ckpt.from_state_dict(params, raw["params"])
        if "opt_state" in raw:
            opt_state = ckpt.from_state_dict(opt_state, raw["opt_state"])
        if shadow is not None and "ema" in raw:
            shadow = ckpt.from_state_dict(shadow, raw["ema"])
        start_step = int(raw.get("step", 0))
        carry = (params, opt_state, shadow)
        if mesh is not None:
            carry = dist_ctx.place_replicated(carry, mesh)
        logging.info(f"resume from {resume_path} at step {start_step}")

    t0 = time.time()
    if args.mode in ("train", "retrain"):
        ds = train_ds
        if args.mode == "retrain":  # drop the forgotten class entirely
            ds, _ = ddpm_data.get_forget_dataset(ds, args.label_to_forget)
        loader = ddpm_data.cycle(BatchIterator(ds, cfgt.batch_size,
                                               shuffle=True, seed=args.seed))
        step_fn = runner.make_train_step(tx)
        for _ in range(start_step):  # fast-forward data stream on resume
            next(loader)
        for step in range(start_step, cfgt.n_iters):
            sub = jax.random.fold_in(key, step)
            batch = dist_ctx.ingest(next(loader))
            carry, loss = step_fn(carry, batch, sub)
            if (step + 1) % cfgt.log_freq == 0:
                logging.info(f"step {step} loss {float(loss):.4f} "
                             f"({time.time() - t0:.1f}s)")
            if (step + 1) % cfgt.snapshot_freq == 0:
                _save(args, carry, step + 1)
    elif args.mode == "saliency_unlearn":
        remain, forget = ddpm_data.get_forget_dataset(train_ds,
                                                      args.label_to_forget)
        remain_it = ddpm_data.cycle(BatchIterator(remain, cfgt.batch_size,
                                                  shuffle=True, seed=args.seed))
        forget_it = ddpm_data.cycle(BatchIterator(forget, cfgt.batch_size,
                                                  shuffle=True, seed=args.seed))
        step_fn = runner.make_saliency_unlearn_step(tx, mask=mask)
        for _ in range(start_step):  # fast-forward data streams on resume
            next(remain_it), next(forget_it)
        for step in range(start_step, cfgt.n_iters):
            sub = jax.random.fold_in(key, step)
            carry, loss = step_fn(
                carry, dist_ctx.ingest(next(remain_it)),
                dist_ctx.ingest(next(forget_it)), sub,
            )
            if (step + 1) % cfgt.log_freq == 0:
                logging.info(f"step {step} loss {float(loss):.4f} "
                             f"({time.time() - t0:.1f}s)")
            if (step + 1) % cfgt.snapshot_freq == 0:
                _save(args, carry, step + 1)
    elif args.mode == "forget":
        # SA baseline: needs the FIM dict + generated class samples
        fim_path = os.path.join(args.ckpt_folder or args.save_dir, "fisher")
        fisher = ckpt.restore(fim_path)["fim"]
        if mesh is not None:
            fisher = dist_ctx.place_replicated(fisher, mesh)
        samples_dir = os.path.join(args.ckpt_folder or ".", "class_samples")
        remember_ds = ddpm_data.image_folder_dataset(
            samples_dir, image_size=bundle.unet.image_size)
        remember_ds = ddpm_data.all_but_one_class_dataset(
            remember_ds, args.label_to_forget)
        loader = ddpm_data.cycle(BatchIterator(remember_ds, cfgt.batch_size,
                                               shuffle=True, seed=args.seed))
        params_mle = jax.tree.map(jnp.copy, carry[0])
        step_fn = runner.make_train_forget_step(tx, fisher, params_mle)
        for _ in range(start_step):
            next(loader)
        for step in range(start_step, cfgt.n_iters):
            sub = jax.random.fold_in(key, step)
            carry, loss = step_fn(carry, dist_ctx.ingest(next(loader)), sub)
            if (step + 1) % cfgt.log_freq == 0:
                logging.info(f"step {step} loss {float(loss):.4f}")
            if (step + 1) % cfgt.snapshot_freq == 0:
                _save(args, carry, step + 1)

    # one final full-state save for every mode, unless the loop's last
    # snapshot already wrote the identical state
    if cfgt.n_iters % cfgt.snapshot_freq != 0:
        _save(args, carry, cfgt.n_iters)


def _save(args, carry, step=0):
    # Full training state, mirroring the reference's
    # states = [model, optimizer, step, (ema)] (diffusion.py:252-265).
    params, opt_state, shadow = carry
    payload = {"params": params, "opt_state": opt_state, "step": step}
    if shadow is not None:
        payload["ema"] = shadow
    ckpt.save(os.path.join(args.save_dir, "ckpt"), payload)


if __name__ == "__main__":
    main()
