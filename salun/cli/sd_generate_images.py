"""SD image generation from a prompt CSV
(parity: SD/eval-scripts/generate-images.py:16-270 — the diffusers CFG
sampling loop over ``case_number,prompt,evaluation_seed`` rows).

Usage: python -m salun.cli.sd_generate_images --prompts_path \
           prompts/imagenette.csv --ckpt_path results/sd/ckpt \
           --save_path evaluation_folder --num_samples 10
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from salun import ckpt as ckpt_store
from salun.sd import SDModules, import_compvis, load_compvis_state_dict
from salun.sd.data import read_prompts_csv


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--prompts_path", required=True)
    p.add_argument("--config", default=None,
                   help="v1-inference.yaml-style model config")
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--save_path", default="evaluation_folder")
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--ddim_steps", type=int, default=100)
    p.add_argument("--num_samples", type=int, default=10)
    p.add_argument("--from_case", type=int, default=0)
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel device count: prompt rows are "
                        "grouped until the sample batch divides dp, each "
                        "row keeping its own evaluation_seed latents, and "
                        "the DDIM chain shards over a (data,) mesh")
    args = p.parse_args(argv)
    from salun.dist import context as dist_ctx

    mesh = dist_ctx.mesh_from_flags(args.dp)
    with dist_ctx.activate(mesh):
        return _main(args)


def _main(args):
    from salun.dist import context as dist_ctx

    if args.config:
        from salun.sd.config import modules_from_yaml

        modules = modules_from_yaml(args.config)
    else:
        modules = SDModules.create()
    key = jax.random.PRNGKey(0)
    if args.ckpt_path and args.ckpt_path.endswith(".ckpt"):
        sd = load_compvis_state_dict(args.ckpt_path)
        params = import_compvis(sd, modules.init(key, args.image_size // 8))
    elif args.ckpt_path:
        params = ckpt_store.restore(args.ckpt_path)["params"]
    else:
        print("WARNING: random init (pipeline check only)")
        params = modules.init(key, args.image_size // 8)

    from math import gcd

    from PIL import Image

    os.makedirs(args.save_path, exist_ok=True)
    latent = args.image_size // 8
    n = args.num_samples
    # group rows so the combined batch divides the mesh (e.g. 10 samples ×
    # dp 8 → 4 rows of 40); each row keeps its own evaluation_seed latents,
    # so grouped output == per-row output (DDIM eta=0 is deterministic
    # given z; the U-Net has no cross-batch ops)
    dp = args.dp if args.dp and args.dp > 1 else 1
    rows_per_call = dp // gcd(n, dp)

    def flush(group):
        prompts = [p for row in group for p in [str(row["prompt"])] * n]
        z = jnp.concatenate([
            modules.initial_latents(
                jax.random.PRNGKey(int(row.get("evaluation_seed", 42))),
                n, latent)
            for row in group])
        imgs = modules.sample(
            params, jax.random.PRNGKey(0), prompts,
            guidance=args.guidance_scale, steps=args.ddim_steps,
            image_size=latent, initial_latents=dist_ctx.constrain_batch(z),
        )
        # flat layout "{save_path}/{case}_{i}.png" (generate-images.py:99,
        # 192) — the downstream eval scripts (imageclassify / nudenet)
        # parse the case_number from the filename of a flat folder listing
        arr = np.asarray(imgs)
        for r, row in enumerate(group):
            case = int(row["case_number"])
            for i in range(n):
                Image.fromarray(
                    (arr[r * n + i] * 255).astype(np.uint8)).save(
                    os.path.join(args.save_path, f"{case}_{i}.png"))
            print(f"case {case}: {n} images → {args.save_path}")

    group = []
    for row in read_prompts_csv(args.prompts_path):
        if int(row["case_number"]) < args.from_case:
            continue
        group.append(row)
        if len(group) >= rows_per_call:
            flush(group)
            group = []
    if group:
        flush(group)


if __name__ == "__main__":
    main()
