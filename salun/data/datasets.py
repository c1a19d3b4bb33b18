"""Self-contained dataset readers (no torchvision dependency).

Every dataset is materialized as a pair of numpy arrays
``(data uint8 NHWC, targets int64)`` — the same in-memory representation the
reference's torchvision wrappers expose via ``.data``/``.targets``
(Classification/dataset.py), which is what all the forget/retain surgery
operates on.

Readers parse the standard on-disk formats directly:
- CIFAR-10/100: the python-pickle batch files.
- SVHN: the ``.mat`` files (scipy).
- TinyImageNet: the extracted folder tree (PIL).
- ImageNet/Flowers102: HF ``datasets`` from a local cache
  (parity: Classification/imagenet.py:14-194) — gated on availability.

When a dataset is not on disk, :func:`synthetic` provides a deterministic
stand-in with the same shape/contract for tests and benchmarks (there is no
network egress in CI).
"""

from __future__ import annotations

import os
import pickle
import tarfile
from dataclasses import dataclass, replace as dc_replace

import numpy as np


@dataclass
class ArrayDataset:
    """In-memory dataset: images uint8 [N,H,W,C], integer targets [N]."""

    data: np.ndarray
    targets: np.ndarray
    num_classes: int
    name: str = ""

    def __len__(self):
        return len(self.data)

    def select(self, idx) -> "ArrayDataset":
        return dc_replace(self, data=self.data[idx], targets=self.targets[idx])

    def copy(self) -> "ArrayDataset":
        return dc_replace(self, data=self.data.copy(), targets=self.targets.copy())


# ---------------------------------------------------------------- CIFAR


def _cifar_unpickle(path):
    with open(path, "rb") as f:
        return pickle.load(f, encoding="bytes")


def cifar10(data_dir: str, train: bool = True) -> ArrayDataset:
    """Parse CIFAR-10 python batches (cifar-10-batches-py)."""
    base = os.path.join(data_dir, "cifar-10-batches-py")
    if not os.path.isdir(base):
        _maybe_extract(data_dir, "cifar-10-python.tar.gz")
    files = (
        [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    )
    xs, ys = [], []
    for fn in files:
        d = _cifar_unpickle(os.path.join(base, fn))
        xs.append(d[b"data"])
        ys.extend(d[b"labels"])
    data = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return ArrayDataset(np.ascontiguousarray(data), np.asarray(ys, np.int64), 10,
                        "cifar10")


def cifar100(data_dir: str, train: bool = True) -> ArrayDataset:
    base = os.path.join(data_dir, "cifar-100-python")
    if not os.path.isdir(base):
        _maybe_extract(data_dir, "cifar-100-python.tar.gz")
    d = _cifar_unpickle(os.path.join(base, "train" if train else "test"))
    data = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return ArrayDataset(
        np.ascontiguousarray(data), np.asarray(d[b"fine_labels"], np.int64), 100,
        "cifar100",
    )


def _maybe_extract(data_dir: str, archive: str):
    path = os.path.join(data_dir, archive)
    if os.path.exists(path):
        with tarfile.open(path) as tf:
            tf.extractall(data_dir)


# ---------------------------------------------------------------- SVHN


def svhn(data_dir: str, train: bool = True) -> ArrayDataset:
    """Parse SVHN .mat files (train_32x32.mat / test_32x32.mat)."""
    import scipy.io

    fn = os.path.join(data_dir, "train_32x32.mat" if train else "test_32x32.mat")
    mat = scipy.io.loadmat(fn)
    data = mat["X"].transpose(3, 0, 1, 2)  # HWCN → NHWC
    labels = mat["y"].astype(np.int64).squeeze()
    labels[labels == 10] = 0  # SVHN convention
    return ArrayDataset(np.ascontiguousarray(data), labels, 10, "svhn")


# ---------------------------------------------------------------- TinyImageNet


def tiny_imagenet(data_dir: str, train: bool = True) -> ArrayDataset:
    """Read the extracted tiny-imagenet-200 tree into arrays.

    Parity with the reference's folder restructure + ImageFolder
    (Classification/dataset.py:372-430): classes ordered by sorted wnid.
    """
    from PIL import Image

    root = data_dir
    wnids = sorted(
        open(os.path.join(root, "wnids.txt")).read().split()
    )
    cls_of = {w: i for i, w in enumerate(wnids)}
    xs, ys = [], []
    if train:
        for w in wnids:
            img_dir = os.path.join(root, "train", w, "images")
            for fn in sorted(os.listdir(img_dir)):
                img = Image.open(os.path.join(img_dir, fn)).convert("RGB")
                xs.append(np.asarray(img, np.uint8))
                ys.append(cls_of[w])
    else:
        anno = os.path.join(root, "val", "val_annotations.txt")
        img_dir = os.path.join(root, "val", "images")
        for line in open(anno):
            fn, w = line.split("\t")[:2]
            img = Image.open(os.path.join(img_dir, fn)).convert("RGB")
            xs.append(np.asarray(img, np.uint8))
            ys.append(cls_of[w])
    return ArrayDataset(np.stack(xs), np.asarray(ys, np.int64), 200, "tiny_imagenet")


# ---------------------------------------------------------------- synthetic


def synthetic(
    n: int = 512,
    num_classes: int = 10,
    image_size: int = 32,
    seed: int = 0,
    class_signal: float = 0.25,
) -> ArrayDataset:
    """Deterministic learnable synthetic data (per-class mean + noise).

    Used by tests/benchmarks when real datasets aren't on disk. Each class
    has a fixed mean image built to survive the training augmentations
    (random crop ±4 / horizontal flip): low-frequency (a coarse grid
    bilinearly upsampled, so small shifts barely change it) and
    horizontally symmetric (flip-invariant). Samples are mean + noise, so a
    small model can fit quickly and unlearning tests see real accuracy
    signal.
    """
    rng = np.random.default_rng(seed)
    coarse = rng.uniform(0.1, 0.9, (num_classes, 4, 4, 3))
    # low-frequency upsample 4x4 → image_size (smooth → crop-robust)
    reps = (image_size + 3) // 4
    blocky = np.kron(coarse, np.ones((1, reps, reps, 1)))[
        :, :image_size, :image_size, :]
    k = max(image_size // 8, 1)
    kernel = np.ones(2 * k + 1) / (2 * k + 1)
    smooth = blocky
    for axis in (1, 2):
        smooth = np.apply_along_axis(
            lambda m: np.convolve(m, kernel, mode="same"), axis, smooth)
    means = 0.5 * (smooth + smooth[:, :, ::-1])  # horizontal symmetry
    ys = rng.integers(0, num_classes, n)
    noise = rng.uniform(-1.0, 1.0, (n, image_size, image_size, 3))
    imgs = (means[ys] * class_signal + 0.5 * (1 - class_signal)
            + noise * 0.2 * (1 - class_signal))
    data = (np.clip(imgs, 0, 1) * 255).astype(np.uint8)
    return ArrayDataset(data, ys.astype(np.int64), num_classes, "synthetic")


# ---------------------------------------------------------------- imagenet


def imagenet(data_dir: str, train: bool = True) -> ArrayDataset:
    """ImageNet-1k from an on-disk HF ``DatasetDict`` (``datasets.
    save_to_disk`` layout — the zero-egress deployment path; parity:
    Classification/imagenet.py:135-166 ``load_dataset("imagenet-1k")``).

    MATERIALIZES decoded arrays, so it serves subsets/miniatures through
    the standard driver path (``main_forget --dataset imagenet``); a
    full-scale 1.2M-image run must stream instead — use
    ``salun.data.imagenet.ImageNetLoader``. Decode size comes from
    ``SALUN_IMAGENET_SIZE`` (default 224, the reference eval resolution).
    """
    import os

    from .imagenet import ImageNetLoader

    size = int(os.environ.get("SALUN_IMAGENET_SIZE", "224"))
    loader = ImageNetLoader(data_dir, image_size=size)
    split = "train" if train else "validation"
    ds = loader.ds[split]
    xs = np.stack([loader._resize(im) for im in ds["image"]])
    ys = np.asarray(ds["label"], np.int64)
    return ArrayDataset(xs, ys, 1000, "imagenet")


REGISTRY = {
    "cifar10": cifar10,
    "cifar100": cifar100,
    "svhn": svhn,
    "TinyImagenet": tiny_imagenet,
    "tiny_imagenet": tiny_imagenet,
    "imagenet": imagenet,
}

NUM_CLASSES = {
    "cifar10": 10,
    "cifar100": 100,
    "svhn": 10,
    "TinyImagenet": 200,
    "tiny_imagenet": 200,
    "imagenet": 1000,
    "synthetic": 10,
}


def load(name: str, data_dir: str, train: bool = True) -> ArrayDataset:
    if name == "synthetic":
        return synthetic(n=2048 if train else 512, seed=0 if train else 1)
    if name not in REGISTRY:
        raise KeyError(f"unknown dataset {name!r}")
    return REGISTRY[name](data_dir, train=train)
