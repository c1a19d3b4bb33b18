"""DDPM FIM driver (parity: DDPM/fim.py + Diffusion.save_fim,
runners/diffusion.py:101-191): per-sample Fisher information over the
conditional eps loss, saved for the SA (train_forget) baseline.

Usage: python -m salun.cli.ddpm_fim --config configs/ddpm/cifar10_train.yml \
           --ckpt_folder ... --n_timestep_samples 1000
"""

from __future__ import annotations

import argparse
import os

import jax

from salun import ckpt
from salun.cli.ddpm_config import load_config
from salun.cli.ddpm_train import _load_params
from salun.data import ddpm_data
from salun.data.loader import BatchIterator
from salun.diffusion.runner import DDPMRunner
from salun.utils.rng import seed_all


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--data", type=str, default="./data")
    p.add_argument("--ckpt_folder", type=str, default=None)
    p.add_argument("--save_dir", type=str, default="results/ddpm")
    p.add_argument("--n_samples", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n_timestep_samples", type=int, default=16,
                   help="set to num_diffusion_timesteps for the exact "
                        "reference estimator (all 1000 t per sample)")
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args(argv)

    os.makedirs(args.save_dir, exist_ok=True)
    seed_all(args.seed)
    key = jax.random.PRNGKey(args.seed)

    bundle = load_config(args.config)
    runner = DDPMRunner(bundle.unet, bundle.schedule, bundle.train)
    params = _load_params(runner, args, key)

    ds = ddpm_data.get_dataset(bundle.dataset, args.data, train=True,
                               image_size=bundle.unet.image_size)
    if args.n_samples:
        ds = ds.select(range(min(args.n_samples, len(ds))))
    loader = BatchIterator(ds, args.batch, shuffle=False, drop_last=True)
    fim = runner.compute_fim(params, loader, key,
                             n_timestep_samples=args.n_timestep_samples)
    ckpt.save(os.path.join(args.save_dir, "fisher"), {"fim": fim})


if __name__ == "__main__":
    main()
