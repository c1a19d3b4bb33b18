#!/usr/bin/env python
"""Asset preflight for real-data parity runs (VERDICT r2 item #3).

This framework's quality-metric parity targets (UA/RA/TA/MIA ±0.5%,
FID 9.6705 / IS 8.1986 — BASELINE.md) need datasets and pretrained
checkpoints that cannot be fetched from a zero-egress container. This
script makes the first hardware-with-assets session turnkey: it checks
presence + checksum of every artifact the parity recipes consume, then
prints the exact command chain to run.

Usage:
    python scripts/preflight_assets.py --root /path/to/assets [--json]

Expected layout under --root (flat; override per-item via env):
    cifar-10-python.tar.gz              (or extracted cifar-10-batches-py/)
    cifar-100-python.tar.gz
    train_32x32.mat test_32x32.mat      (SVHN)
    stl10_binary.tar.gz                 (or extracted stl10_binary/)
    tiny-imagenet-200/                  (extracted tree)
    diffusion_cifar10_model/model-790000.ckpt        (DDPM pretrain)
    ema_diffusion_cifar10_model/model-790000.ckpt
    pt_inception-2015-12-05-6726825d.pth             (FID network)
    sd-v1-4.ckpt                                     (CompVis SD)
    bpe_simple_vocab_16e6.txt.gz                     (CLIP BPE)
    resnet18_cifar10.pth.tar            (optional: pretrained classifier)

Checksum sources: torchvision's published dataset md5s
(torchvision/datasets/{cifar,svhn,stl10}.py), the reference's DDPM ckpt
map (/root/reference/DDPM/functions/ckpt_util.py:7-38). Artifacts without
a trusted pinned checksum are presence-checked and their computed sha256
printed for manual confirmation.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

# name → (relpath, md5 | None, what-it-unlocks)
ARTIFACTS = {
    "cifar10": ("cifar-10-python.tar.gz",
                "c58f30108f718f92721af3b95e74349a",
                "classification pretrain/unlearn + DDPM data"),
    "cifar100": ("cifar-100-python.tar.gz",
                 "eb9058c3a382ffc7106e4002c42a8d85",
                 "CIFAR-100 classification workload"),
    "svhn_train": ("train_32x32.mat", "e26dedcc434d2e4c54c9b2d4a06d8373",
                   "SVHN workload"),
    "svhn_test": ("test_32x32.mat", "eb5a983be6a315427106f1b5b1fe1e53",
                  "SVHN workload"),
    "stl10": ("stl10_binary.tar.gz", "91f7769df0f17e558f3565bffb0c7dfb",
              "STL-10 DDPM workload"),
    "tiny_imagenet": ("tiny-imagenet-200", None,
                      "TinyImageNet classification workload"),
    "ddpm_cifar10": ("diffusion_cifar10_model/model-790000.ckpt",
                     "82ed3067fd1002f5cf4c339fb80c4669",
                     "DDPM saliency-unlearn from the public pretrain"),
    "ddpm_ema_cifar10": ("ema_diffusion_cifar10_model/model-790000.ckpt",
                         "1fa350b952534ae442b1d5235cce5cd3",
                         "DDPM sampling from the public EMA pretrain"),
    "pt_inception": ("pt_inception-2015-12-05-6726825d.pth", None,
                     "FID/sFID/IS/P&R evaluation (evalx.inception)"),
    "sd_v1_4": ("sd-v1-4.ckpt", None,
                "SD concept-erasure workload (sd.import_ckpt)"),
    "clip_bpe": ("bpe_simple_vocab_16e6.txt.gz", None,
                 "real CLIP tokenizer ids (sd.tokenizer)"),
    "resnet18_ckpt": ("resnet18_cifar10.pth.tar", None,
                      "skip the 182-epoch pretrain (ckpt.import_resnet)"),
}

RECIPE = """
# Parity-run command chain (Classification, CIFAR-10, 10% random forgetting;
# reference: Classification/README.md steps 1-3):
python -m salun.cli.main_train    --dataset cifar10 --arch resnet18 \\
    --data {root} --epochs 182 --lr 0.1 --batch_size 256 --save_dir runs/pretrain
python -m salun.cli.generate_mask --dataset cifar10 --arch resnet18 \\
    --data {root} --model_path runs/pretrain/checkpoint \\
    --num_indexes_to_replace 4500 --save_dir runs/mask
python -m salun.cli.main_random   --dataset cifar10 --arch resnet18 \\
    --data {root} --model_path runs/pretrain/checkpoint \\
    --mask_path runs/mask/with_0.5 --unlearn RL --unlearn_lr 0.013 \\
    --unlearn_epochs 10 --num_indexes_to_replace 4500 --save_dir runs/salun
# → UA/RA/TA printed; MIA = SVC_MIA_forget_efficacy["confidence"]x100

# DDPM class forgetting (reference: DDPM/README.md):
python -m salun.cli.ddpm_train --mode generate_mask \\
    --config configs/ddpm/cifar10_generate_mask.yml --data {root} \\
    --ckpt_folder {root}/diffusion_cifar10_model --save_dir runs/ddpm_mask
python -m salun.cli.ddpm_train --mode saliency_unlearn --method rl \\
    --config configs/ddpm/cifar10_saliency_unlearn.yml --data {root} \\
    --ckpt_folder {root}/diffusion_cifar10_model \\
    --mask_path runs/ddpm_mask/mask --save_dir runs/ddpm_unlearn
python -m salun.cli.ddpm_sample --mode sample_fid \\
    --config configs/ddpm/cifar10_sample.yml --ckpt_folder runs/ddpm_unlearn
python -m salun.cli.ddpm_evaluator <generated_dir> <reference_batch_dir> \\
    --inception_weights {root}/pt_inception-2015-12-05-6726825d.pth
# → FID target 9.6705, IS 8.1986 (DDPM/README.md:70-75)

# SD concept erasure (reference: SD/README.md):
export SALUN_CLIP_BPE={root}/bpe_simple_vocab_16e6.txt.gz
python -m salun.cli.sd_train generate_mask --ckpt_path {root}/sd-v1-4.ckpt \\
    --class_to_forget 0 --threshold 0.5 --save_dir runs/sd_mask
python -m salun.cli.sd_train random_label --ckpt_path {root}/sd-v1-4.ckpt \\
    --mask_path runs/sd_mask/with_0.5 --train_method full --lr 1e-5 \\
    --epochs 5 --alpha 0.5 --save_dir runs/sd_unlearn
python -m salun.cli.sd_generate_images --prompts_path prompts/imagenette.csv \\
    --ckpt_path runs/sd_unlearn --save_path evaluation_folder
"""


def _md5(path: str, chunk=1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _sha256(path: str, chunk=1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def check(root: str) -> dict:
    results = {}
    for name, (rel, md5, unlocks) in ARTIFACTS.items():
        path = os.path.join(root, rel)
        # extracted-archive fallbacks count as present
        alt = {
            "cifar10": "cifar-10-batches-py",
            "cifar100": "cifar-100-python",
            "stl10": "stl10_binary",
        }.get(name)
        if not os.path.exists(path) and alt and os.path.isdir(
                os.path.join(root, alt)):
            results[name] = {"status": "present-extracted", "path":
                             os.path.join(root, alt), "unlocks": unlocks}
            continue
        if not os.path.exists(path):
            results[name] = {"status": "MISSING", "path": path,
                             "unlocks": unlocks}
            continue
        if os.path.isdir(path):
            results[name] = {"status": "present", "path": path,
                             "unlocks": unlocks}
            continue
        if md5 is not None:
            got = _md5(path)
            ok = got == md5
            results[name] = {"status": "ok" if ok else "CHECKSUM-MISMATCH",
                             "md5": got, "expected": md5, "path": path,
                             "unlocks": unlocks}
        else:
            results[name] = {"status": "present-unpinned",
                             "sha256": _sha256(path), "path": path,
                             "unlocks": unlocks}
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.environ.get("SALUN_ASSETS", "assets"))
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--show-recipe", action="store_true",
                    help="print the parity command chain even with "
                         "artifacts missing")
    args = ap.parse_args(argv)

    results = check(args.root)
    if args.json:
        print(json.dumps(results, indent=2))
    else:
        width = max(len(n) for n in ARTIFACTS)
        for name, r in results.items():
            print(f"{name:<{width}}  {r['status']:<20} {r['path']}")
            if r["status"] == "MISSING":
                print(f"{'':<{width}}  → unlocks: {r['unlocks']}")
        missing = [n for n, r in results.items() if r["status"] == "MISSING"]
        bad = [n for n, r in results.items()
               if r["status"] == "CHECKSUM-MISMATCH"]
        print()
        if bad:
            print(f"CHECKSUM MISMATCH (re-fetch these): {', '.join(bad)}")
        if missing:
            print(f"missing {len(missing)}/{len(ARTIFACTS)}: "
                  f"{', '.join(missing)}")
            if args.show_recipe:
                print("\nparity recipe (once assets exist):")
                print(RECIPE.format(root=args.root))
        else:
            print("all artifacts present — parity recipe:")
            print(RECIPE.format(root=args.root))
    return 1 if any(r["status"] in ("MISSING", "CHECKSUM-MISMATCH")
                    for r in results.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
