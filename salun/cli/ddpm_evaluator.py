"""DDPM generative-quality evaluator CLI
(parity: DDPM/evaluator.py:39-101 — IS/FID/sFID/Precision/Recall between a
reference image folder and a sample folder, appended to result.csv).

Features come from the flax InceptionV3 (salun.evalx.inception) when a
pytorch-fid weight file is supplied via --inception_weights; the metric
math (salun.evalx.fid) is identical either way.

Usage: python -m salun.cli.ddpm_evaluator ref_batch sample_batch \
           --inception_weights pt_inception-2015-12-05.pth
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np


def read_images_folder(path: str, image_size=None) -> np.ndarray:
    """Folder of images → float32 [0,1] NHWC (evaluator.py:719-740)."""
    from PIL import Image

    files = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    imgs = []
    for f in files:
        img = Image.open(f).convert("RGB")
        if image_size:
            img = img.resize((image_size, image_size))
        imgs.append(np.asarray(img, np.uint8))
    return np.stack(imgs).astype(np.float32) / 255.0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ref_batch")
    p.add_argument("sample_batch")
    p.add_argument("--inception_weights", type=str, default=None)
    p.add_argument("--output_csv", type=str,
                   default="results/cifar10/forget/result.csv")
    p.add_argument("--batch_size", type=int, default=64)
    args = p.parse_args(argv)

    from salun.evalx.fid import evaluate_all
    from salun.evalx.inception import InceptionV3, load_params, make_feature_fn

    if args.inception_weights:
        params, stats = load_params(args.inception_weights)
    else:
        import jax
        import jax.numpy as jnp

        print("WARNING: no --inception_weights; using random-init features "
              "(pipeline check only — NOT comparable to reference numbers)")
        model = InceptionV3()
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        params, stats = v["params"], v["batch_stats"]

    extract = make_feature_fn(params, stats, args.batch_size)
    ref = read_images_folder(args.ref_batch)
    gen = read_images_folder(args.sample_batch)
    r_pool, r_spatial, _ = extract(ref)
    g_pool, g_spatial, g_softmax = extract(gen)

    results = evaluate_all(r_pool, g_pool, r_spatial, g_spatial, g_softmax)
    print(results)

    os.makedirs(os.path.dirname(args.output_csv) or ".", exist_ok=True)
    write_header = not os.path.exists(args.output_csv)
    with open(args.output_csv, "a", newline="") as f:
        w = csv.writer(f)
        if write_header:
            w.writerow(["ref", "sample"] + list(results))
        w.writerow([args.ref_batch, args.sample_batch] +
                   [f"{v:.4f}" for v in results.values()])


if __name__ == "__main__":
    main()
