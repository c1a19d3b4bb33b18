"""DDPM workload data pipelines.

Parity with DDPM/datasets/__init__.py:30-298: CIFAR10/STL10 loaders
yielding [0,1] float images + class labels, the retain/forget class split
(``get_forget_dataset``, datasets/__init__.py:120-177), folder-of-images
datasets (``ImagePathDataset``, :270-290) and the FID reference snapshot
(save_base_dataset.py:34-115: 500/class excluding the forgotten class).

The reference materializes filtered datasets as Python lists
(datasets/__init__.py:161-163); here splits are index selections over
in-memory arrays and batches stream to the device uint8 (SURVEY.md §7
"hard parts").
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from .datasets import ArrayDataset, load, synthetic
from .loader import BatchIterator


def get_dataset(name: str, data_dir: str, train: bool = True,
                image_size: int = None) -> ArrayDataset:
    """Dataset by name, resized to ``image_size`` when it differs — parity
    with the reference's transforms.Resize(config.data.image_size)
    (DDPM/datasets/__init__.py:36,41; STL-10 trains at 64, not its native
    96)."""
    if name.upper() == "CIFAR10" or name == "cifar10":
        ds = load("cifar10", data_dir, train)
    elif name.upper() == "STL10" or name == "stl10":
        ds = _stl10(data_dir, train)
    elif name == "synthetic":
        ds = synthetic(n=512 if train else 128)
    else:
        raise KeyError(name)
    if image_size and ds.data.shape[1] != image_size:
        ds = ArrayDataset(_resize_batch(ds.data, image_size),
                          ds.targets, ds.num_classes, ds.name)
    return ds


def _resize_batch(images_u8: np.ndarray, size: int) -> np.ndarray:
    """Resize NHWC uint8 images with PIL bilinear (torchvision Resize
    default interpolation)."""
    from PIL import Image

    out = np.empty((len(images_u8), size, size, images_u8.shape[-1]),
                   np.uint8)
    for i, img in enumerate(images_u8):
        out[i] = np.asarray(
            Image.fromarray(img).resize((size, size), Image.BILINEAR))
    return out


def _stl10(data_dir: str, train: bool) -> ArrayDataset:
    """Parse the STL-10 binary files (train_X.bin etc.)."""
    base = os.path.join(data_dir, "stl10_binary")
    split = "train" if train else "test"
    x = np.fromfile(os.path.join(base, f"{split}_X.bin"), np.uint8)
    y = np.fromfile(os.path.join(base, f"{split}_y.bin"), np.uint8)
    x = x.reshape(-1, 3, 96, 96).transpose(0, 3, 2, 1)  # CHW col-major → HWC
    return ArrayDataset(np.ascontiguousarray(x), (y - 1).astype(np.int64), 10,
                        "stl10")


def get_forget_dataset(
    ds: ArrayDataset, label_to_forget: int
) -> Tuple[ArrayDataset, ArrayDataset]:
    """(remain, forget) class split (datasets/__init__.py:120-177)."""
    forget_idx = np.flatnonzero(ds.targets == label_to_forget)
    remain_idx = np.flatnonzero(ds.targets != label_to_forget)
    return ds.select(remain_idx), ds.select(forget_idx)


def image_folder_dataset(root: str, image_size: Optional[int] = None,
                         label: int = 0) -> ArrayDataset:
    """Folder of images → arrays (ImagePathDataset parity). Subdirs named
    by class index become labels (class_samples layout, train_forget)."""
    from PIL import Image

    xs, ys = [], []
    entries = sorted(os.listdir(root))
    subdirs = [e for e in entries if os.path.isdir(os.path.join(root, e))]
    if subdirs:
        for d in subdirs:
            try:
                cls = int(d)
            except ValueError:
                cls = subdirs.index(d)
            for fn in sorted(os.listdir(os.path.join(root, d))):
                img = Image.open(os.path.join(root, d, fn)).convert("RGB")
                if image_size:
                    img = img.resize((image_size, image_size))
                xs.append(np.asarray(img, np.uint8))
                ys.append(cls)
    else:
        for fn in entries:
            img = Image.open(os.path.join(root, fn)).convert("RGB")
            if image_size:
                img = img.resize((image_size, image_size))
            xs.append(np.asarray(img, np.uint8))
            ys.append(label)
    return ArrayDataset(np.stack(xs), np.asarray(ys, np.int64),
                        int(max(ys)) + 1, root)


def all_but_one_class_dataset(ds: ArrayDataset, label_to_forget: int
                              ) -> ArrayDataset:
    """Remember set for train_forget (all_but_one_class_path_dataset)."""
    return ds.select(np.flatnonzero(ds.targets != label_to_forget))


def save_base_dataset(ds: ArrayDataset, excluded_class: int,
                      per_class: int = 500) -> ArrayDataset:
    """FID reference set: per_class images of every class except the
    forgotten one (save_base_dataset.py:34-115)."""
    keep = []
    for c in range(ds.num_classes):
        if c == excluded_class:
            continue
        idx = np.flatnonzero(ds.targets == c)[:per_class]
        keep.append(idx)
    return ds.select(np.concatenate(keep))


def cycle(loader: BatchIterator):
    """Infinite batch stream (functions/__init__.py cycle)."""
    while True:
        for batch in loader:
            yield batch
