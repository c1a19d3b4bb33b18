"""DDPM sampling driver (parity: DDPM/sample.py + runner sample modes
diffusion.py:642-931): sample / sample_fid / sample_classes /
sample_one_class / sample_visualization.

Usage:
  python -m salun.cli.ddpm_sample --config configs/ddpm/cifar10_train.yml \
      --mode sample_fid --ckpt_folder results/ddpm --n_samples 5000
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from salun import ckpt
from salun.cli.ddpm_config import load_config
from salun.diffusion.runner import DDPMRunner
from salun.utils.rng import seed_all


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="SalUn-TPU DDPM sampling")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--mode", type=str, default="sample_fid",
                   choices=["sample", "sample_fid", "sample_classes",
                            "sample_one_class", "sample_visualization",
                            "sample_trajectory"])
    p.add_argument("--ckpt_folder", type=str, required=True)
    p.add_argument("--save_dir", type=str, default="results/ddpm/samples")
    p.add_argument("--n_samples_per_class", type=int, default=5000)
    p.add_argument("--batch", type=int, default=500)
    p.add_argument("--classes", type=str, default=None,
                   help="'x0' excludes class 0 (functions/__init__.py:126-133)")
    p.add_argument("--cond_scale", type=float, default=2.0)
    p.add_argument("--sample_type", type=str, default="generalized")
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel device count for sampling: each "
                        "batch's reverse chain shards over a (data,) mesh "
                        "(the reference fans sample_fid over 2 GPUs via "
                        "DataParallel, runners/diffusion.py:773-824). "
                        "Batches are padded up to a multiple of dp; "
                        "pick --batch divisible by dp to avoid waste.")
    return p.parse_args(argv)


def create_class_labels(spec: str, n_classes: int):
    """'x0' exclusion syntax (DDPM/functions/__init__.py:126-133)."""
    if spec is None:
        return list(range(n_classes))
    if spec.startswith("x"):
        excluded = {int(c) for c in spec[1:].split(",")}
        return [c for c in range(n_classes) if c not in excluded]
    return [int(c) for c in spec.split(",")]


def main(argv=None):
    args = parse_args(argv)
    from salun.dist import context as dist_ctx

    mesh = dist_ctx.mesh_from_flags(args.dp)
    with dist_ctx.activate(mesh):
        return _main(args)


def _main(args):
    os.makedirs(args.save_dir, exist_ok=True)
    seed_all(args.seed)
    key = jax.random.PRNGKey(args.seed)

    bundle = load_config(args.config, cond_scale=args.cond_scale)
    runner = DDPMRunner(bundle.unet, bundle.schedule, bundle.train)

    payload = ckpt.restore(os.path.join(args.ckpt_folder, "ckpt"))
    params = payload["ema"] if args.use_ema and "ema" in payload else payload["params"]

    classes = create_class_labels(args.classes, bundle.unet.n_classes)
    if args.mode == "sample_trajectory":
        # per-step chain dump (the reference keeps every x_t for its
        # sample mode, denoising.py:31,93) — one .npz with xs + x0 preds
        xs, x0s = runner.sample_trajectory(
            params, key, classes=classes, cond_scale=args.cond_scale,
            sample_type=args.sample_type, timesteps=args.timesteps)
        out = os.path.join(args.save_dir, "trajectory.npz")
        np.savez_compressed(out, xs=np.asarray(xs), x0_preds=np.asarray(x0s),
                            classes=np.asarray(classes))
        print(f"saved {out} xs={tuple(np.asarray(xs).shape)}")
        return
    if args.mode == "sample_visualization":
        imgs = runner.sample_visualization(params, key,
                                           cond_scale=args.cond_scale,
                                           timesteps=args.timesteps)
        _save_grid(imgs, os.path.join(args.save_dir, "grid.png"),
                   bundle.unet.n_classes)
        return

    per_class = (1 if args.mode == "sample_one_class"
                 else args.n_samples_per_class)
    for c in classes:
        out_dir = os.path.join(args.save_dir, str(c))
        os.makedirs(out_dir, exist_ok=True)
        remaining = per_class
        idx = 0
        while remaining > 0:
            n = min(args.batch, remaining)
            # a --dp mesh shards the chain's batch dim; pad ragged tails up
            # to a dp multiple (surplus samples are dropped after decode)
            n_run = (-(-n // args.dp) * args.dp if args.dp and args.dp > 1
                     else n)
            key, sub = jax.random.split(key)
            imgs = runner.sample_classes(
                params, sub, classes=[c], n_per_class=n_run,
                cond_scale=args.cond_scale, sample_type=args.sample_type,
                timesteps=args.timesteps,
            )
            _save_images(np.asarray(imgs)[:n], out_dir, start=idx)
            idx += n
            remaining -= n


def _save_images(imgs: np.ndarray, out_dir: str, start: int = 0):
    from PIL import Image

    for i, img in enumerate(imgs):
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(out_dir, f"{start + i}.png"))


def _save_grid(imgs, path: str, n_cols: int):
    from PIL import Image

    arr = (np.clip(np.asarray(imgs), 0, 1) * 255).astype(np.uint8)
    n, h, w, c = arr.shape
    rows = (n + n_cols - 1) // n_cols
    grid = np.zeros((rows * h, n_cols * w, c), np.uint8)
    for i, img in enumerate(arr):
        r, col = divmod(i, n_cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = img
    Image.fromarray(grid).save(path)


if __name__ == "__main__":
    main()
