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
    args = p.parse_args(argv)

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

    from PIL import Image

    for row in read_prompts_csv(args.prompts_path):
        case = int(row["case_number"])
        if case < args.from_case:
            continue
        prompt = [str(row["prompt"])] * args.num_samples
        seed = int(row.get("evaluation_seed", 42))
        imgs = modules.sample(
            params, jax.random.PRNGKey(seed), prompt,
            guidance=args.guidance_scale, steps=args.ddim_steps,
            image_size=args.image_size // 8,
        )
        # flat layout "{save_path}/{case}_{i}.png" (generate-images.py:99,
        # 192) — the downstream eval scripts (imageclassify / nudenet) parse
        # the case_number from the filename of a flat folder listing
        os.makedirs(args.save_path, exist_ok=True)
        for i, img in enumerate(np.asarray(imgs)):
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(args.save_path, f"{case}_{i}.png"))
        print(f"case {case}: {args.num_samples} images → {args.save_path}")


if __name__ == "__main__":
    main()
