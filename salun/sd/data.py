"""SD workload data (parity: SD/train-scripts/dataset.py:36-176).

Imagenette (HF ``frgfm/imagenette`` from a local cache, or an image-folder
tree) with the reference's prompt templates ("an image of a {label}"),
forget/remain/ga splits, and the NSFW/NOT-NSFW generated-image folders.
Images are resized+center-cropped to ``image_size`` and scaled to [−1,1]
(get_transform, dataset.py:23-33).
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from salun.data.datasets import ArrayDataset, synthetic

IMAGENETTE_CLASSES = [
    "tench", "english springer", "cassette player", "chain saw", "church",
    "french horn", "garbage truck", "gas pump", "golf ball", "parachute",
]

DESCRIPTIONS = [f"an image of a {label}" for label in IMAGENETTE_CLASSES]

# NSFW-removal prompt pair (nsfw_removal.py:83-104)
WORD_NUDE = "a photo of a nude person"
WORD_WEAR = "a photo of a person wearing clothes"


def _resize_center_crop(img, size: int) -> np.ndarray:
    from PIL import Image

    w, h = img.size
    scale = size / min(w, h)
    img = img.resize((max(size, int(round(w * scale))),
                      max(size, int(round(h * scale)))), Image.BICUBIC)
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    img = img.crop((left, top, left + size, top + size)).convert("RGB")
    return np.asarray(img, np.uint8)


def load_imagenette(data_dir: str, image_size: int = 512,
                    split: str = "train") -> ArrayDataset:
    """HF imagenette from local cache, or an extracted imagenette2 folder,
    or a synthetic stand-in for tests."""
    try:
        from datasets import load_dataset

        ds = load_dataset("frgfm/imagenette", "160px", split=split)
        xs = [np.asarray(
            _resize_center_crop(ex["image"].convert("RGB"), image_size))
            for ex in ds]
        ys = np.asarray(ds["label"], np.int64)
        return ArrayDataset(np.stack(xs), ys, 10, "imagenette")
    except Exception:
        pass
    folder = os.path.join(data_dir, "imagenette2", split)
    if os.path.isdir(folder):
        from PIL import Image

        wnids = sorted(os.listdir(folder))
        xs, ys = [], []
        for ci, w in enumerate(wnids):
            for fn in sorted(os.listdir(os.path.join(folder, w))):
                img = Image.open(os.path.join(folder, w, fn))
                xs.append(_resize_center_crop(img, image_size))
                ys.append(ci)
        return ArrayDataset(np.stack(xs), np.asarray(ys, np.int64), 10,
                            "imagenette")
    return synthetic(n=64, num_classes=10, image_size=image_size, seed=7)


def forget_remain_split(ds: ArrayDataset, class_to_forget: int):
    forget = ds.select(np.flatnonzero(ds.targets == class_to_forget))
    remain = ds.select(np.flatnonzero(ds.targets != class_to_forget))
    return forget, remain


def load_image_folder(root: str, image_size: int = 512) -> ArrayDataset:
    """Flat image folder → dataset (NSFW/NOT_NSFW generated sets)."""
    from PIL import Image

    xs = []
    for fn in sorted(os.listdir(root)):
        if not fn.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        xs.append(_resize_center_crop(Image.open(os.path.join(root, fn)),
                                      image_size))
    return ArrayDataset(np.stack(xs), np.zeros(len(xs), np.int64), 1, root)


def to_pm1(batch_images) -> np.ndarray:
    """uint8 → [−1,1] float (Normalize([0.5],[0.5]) after ToTensor)."""
    return batch_images.astype(np.float32) / 127.5 - 1.0


def read_prompts_csv(path: str) -> List[dict]:
    """prompts/*.csv rows: case_number,prompt,evaluation_seed[,class,classidx]
    (SD/prompts/imagenette.csv format)."""
    import csv

    with open(path, newline="", encoding="utf-8-sig") as f:
        return list(csv.DictReader(f))
