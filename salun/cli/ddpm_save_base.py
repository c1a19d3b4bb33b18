"""FID reference-set snapshot CLI
(parity: DDPM/save_base_dataset.py:34-115 — 500 images/class of the train
set excluding the forgotten class, written as an image folder).

Usage: python -m salun.cli.ddpm_save_base --dataset cifar10 \
           --label_to_forget 0 --save_dir results/cifar10/base
"""

from __future__ import annotations

import argparse
import os


from salun.data import ddpm_data


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="cifar10")
    p.add_argument("--data", default="./data")
    p.add_argument("--label_to_forget", type=int, default=0)
    p.add_argument("--per_class", type=int, default=500)
    p.add_argument("--save_dir", default="results/base")
    args = p.parse_args(argv)

    from PIL import Image

    ds = ddpm_data.get_dataset(args.dataset, args.data, train=True)
    base = ddpm_data.save_base_dataset(ds, args.label_to_forget,
                                       args.per_class)
    os.makedirs(args.save_dir, exist_ok=True)
    for i, (img, lab) in enumerate(zip(base.data, base.targets)):
        d = os.path.join(args.save_dir, str(int(lab)))
        os.makedirs(d, exist_ok=True)
        Image.fromarray(img).save(os.path.join(d, f"{i}.png"))
    print(f"saved {len(base)} reference images → {args.save_dir}")


if __name__ == "__main__":
    main()
