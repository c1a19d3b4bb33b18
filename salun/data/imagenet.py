"""ImageNet-family loaders via HF datasets.

Parity with Classification/imagenet.py:14-194: ``load_dataset("imagenet-1k")``
(plus TinyImageNet/Flowers102 variants) with retain/forget subset splitting
(imagenet.py:135-166) and ``get_x_y_from_data_dict`` (imagenet.py:169-175).
Gated on a local HF cache (zero-egress environments must pre-seed it).

TPU note: ImageNet doesn't fit in host RAM as a single array; this module
yields streaming batch dicts rather than ArrayDatasets. Decoding runs on a
thread pool and batches are produced by a background prefetch queue
(salun.data.pipeline), so host input overlaps device compute — the
reference's loop (and round 1's) decoded serially on the main thread.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from .pipeline import parallel_decode, prefetch


def get_x_y_from_data_dict(data: dict, as_numpy: bool = True):
    """(image, target) from a HF-style batch dict (imagenet.py:169-175)."""
    x, y = data["image"], data["label"]
    if as_numpy:
        x = np.asarray(x)
        y = np.asarray(y)
    return x, y


class ImageNetLoader:
    """Streaming train/val loaders with class- or index-based forget
    marking (imagenet.py:135-166)."""

    def __init__(self, data_path: str = "imagenet-1k", batch_size: int = 256,
                 image_size: int = 224, seed: int = 1,
                 decode_workers: Optional[int] = None,
                 prefetch_depth: int = 4):
        import os

        if os.path.isdir(data_path):
            # an on-disk DatasetDict (datasets.save_to_disk) — the
            # zero-egress deployment path: seed once, load locally
            from datasets import load_from_disk

            self.ds = load_from_disk(data_path)
        else:
            from datasets import load_dataset

            self.ds = load_dataset(data_path)
        self.batch_size = batch_size
        self.image_size = image_size
        self.seed = seed
        self._decoder = parallel_decode(self._resize, decode_workers)
        self.prefetch_depth = prefetch_depth

    def _resize(self, img):
        from PIL import Image

        img = img.convert("RGB").resize((self.image_size, self.image_size),
                                        Image.BILINEAR)
        return np.asarray(img, np.uint8)

    def _iter_split(self, split, indices=None, shuffle=True) -> Iterator[dict]:
        return prefetch(self._produce(split, indices, shuffle),
                        depth=self.prefetch_depth)

    def _produce(self, split, indices=None, shuffle=True) -> Iterator[dict]:
        ds = self.ds[split]
        n = len(ds)
        order = np.arange(n) if indices is None else np.asarray(indices)
        if shuffle:
            np.random.RandomState(self.seed).shuffle(order)
        bs = self.batch_size
        for start in range(0, len(order), bs):
            idx = order[start : start + bs]
            rows = ds[idx.tolist()]
            imgs = self._decoder.map(rows["image"])
            labels = np.asarray(rows["label"], np.int32)
            w = np.ones(len(idx), np.float32)
            if len(idx) < bs:
                rep = np.resize(np.arange(len(idx)), bs - len(idx))
                imgs = np.concatenate([imgs, imgs[rep]])
                labels = np.concatenate([labels, labels[rep]])
                w = np.concatenate([w, np.zeros(bs - len(idx), np.float32)])
            yield {"image": imgs, "label": labels, "weight": w}

    def forget_retain_indices(self, class_to_replace: int,
                              num_indexes_to_replace: Optional[int] = None):
        labels = np.asarray(self.ds["train"]["label"])
        if class_to_replace == -1:
            forget = np.arange(len(labels))
        else:
            forget = np.flatnonzero(labels == class_to_replace)
        if num_indexes_to_replace is not None:
            rng = np.random.RandomState(self.seed - 1)
            forget = rng.choice(forget, num_indexes_to_replace, replace=False)
        retain = np.setdiff1d(np.arange(len(labels)), forget)
        return forget, retain

    def loaders(self, class_to_replace: int,
                num_indexes_to_replace: Optional[int] = None):
        forget, retain = self.forget_retain_indices(
            class_to_replace, num_indexes_to_replace)
        return {
            "forget": lambda: self._iter_split("train", forget),
            "retain": lambda: self._iter_split("train", retain),
            "val": lambda: self._iter_split("validation", shuffle=False),
        }
