"""spack — packed-dataset format with a native reader.

Capability parity with the reference's LMDB pipeline
(Classification/lmdb_dataset.py:22-128: ImageFolderLMDB reader + folder2lmdb
packer), rebuilt for the TPU data path: one mmap'd file, an O(1) index, and
a multithreaded C++ batch-gather (salun/native/spack.cc) that assembles
uint8 batches without per-sample Python. Falls back to a pure-numpy mmap
reader when the shared library isn't built.

Writer: :func:`pack_arrays` / :func:`pack_folder` (folder2lmdb equivalent).
Reader: :class:`SpackReader` with ``gather(indices)`` for fixed-size raw
records, pluggable into salun.data.loader.BatchIterator via
:class:`SpackDataset`.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Optional, Tuple

import numpy as np

_MAGIC = b"SPK1"
_LIB = None
_LIB_TRIED = False


def _native_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.join(os.path.dirname(__file__), "..", "native")
    so = os.path.abspath(os.path.join(here, "libspack.so"))
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.abspath(here)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.spack_open.restype = ctypes.c_void_p
        lib.spack_open.argtypes = [ctypes.c_char_p]
        lib.spack_count.restype = ctypes.c_uint64
        lib.spack_count.argtypes = [ctypes.c_void_p]
        lib.spack_label.restype = ctypes.c_int64
        lib.spack_label.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.spack_record_size.restype = ctypes.c_uint64
        lib.spack_record_size.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.spack_get.restype = ctypes.c_uint64
        lib.spack_get.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                  ctypes.c_void_p, ctypes.c_uint64]
        lib.spack_gather.restype = None
        lib.spack_gather.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.spack_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


# ------------------------------------------------------------------ writer


def pack_records(path: str, records, labels) -> None:
    """Write records (list of bytes) + labels into a spack file."""
    entries = []
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<QQ", len(records), 0))  # placeholder offset
        for rec, lab in zip(records, labels):
            entries.append((f.tell(), len(rec), int(lab)))
            f.write(rec)
        index_offset = f.tell()
        for off, size, lab in entries:
            f.write(struct.pack("<QQq", off, size, lab))
        f.seek(12)
        f.write(struct.pack("<Q", index_offset))


def pack_arrays(path: str, data: np.ndarray, labels: np.ndarray) -> None:
    """Pack a uint8 array dataset (fixed-size raw records)."""
    assert data.dtype == np.uint8
    recs = [np.ascontiguousarray(x).tobytes() for x in data]
    pack_records(path, recs, labels)


def pack_folder(path: str, folder: str, image_size: Optional[int] = None):
    """folder2lmdb equivalent (lmdb_dataset.py:90-128): class-subdir tree →
    spack of raw RGB arrays."""
    from PIL import Image

    classes = sorted(
        d for d in os.listdir(folder)
        if os.path.isdir(os.path.join(folder, d))
    )
    recs, labels = [], []
    for ci, cls in enumerate(classes):
        d = os.path.join(folder, cls)
        for fn in sorted(os.listdir(d)):
            img = Image.open(os.path.join(d, fn)).convert("RGB")
            if image_size:
                img = img.resize((image_size, image_size))
            recs.append(np.asarray(img, np.uint8).tobytes())
            labels.append(ci)
    pack_records(path, recs, labels)
    return classes


# ------------------------------------------------------------------ reader


class SpackReader:
    def __init__(self, path: str):
        self.path = path
        self._lib = _native_lib()
        self._h = None
        if self._lib is not None:
            self._h = self._lib.spack_open(path.encode())
            if not self._h:
                self._lib = None
        if self._lib is None:
            self._open_python(path)
        else:
            self._count = int(self._lib.spack_count(self._h))

    def _open_python(self, path):
        self._mm = np.memmap(path, np.uint8, mode="r")
        assert bytes(self._mm[:4]) == _MAGIC
        self._count, index_offset = struct.unpack("<QQ",
                                                  self._mm[4:20].tobytes())
        idx = np.frombuffer(
            self._mm[index_offset : index_offset + 24 * self._count],
            dtype=np.dtype([("offset", "<u8"), ("size", "<u8"),
                            ("label", "<i8")]),
        )
        self._index = idx

    def __len__(self):
        return self._count

    @property
    def native(self) -> bool:
        return self._lib is not None

    def labels(self) -> np.ndarray:
        if self._lib is not None:
            return np.array([
                self._lib.spack_label(self._h, i) for i in range(self._count)
            ], np.int64)
        return self._index["label"].copy()

    def record_size(self, i: int = 0) -> int:
        if self._lib is not None:
            return int(self._lib.spack_record_size(self._h, i))
        return int(self._index["size"][i])

    def get(self, i: int) -> bytes:
        size = self.record_size(i)
        if self._lib is not None:
            buf = np.empty(size, np.uint8)
            self._lib.spack_get(self._h, i, buf.ctypes.data, size)
            return buf.tobytes()
        off = int(self._index["offset"][i])
        return self._mm[off : off + size].tobytes()

    def gather(self, indices: np.ndarray, record_size: Optional[int] = None,
               threads: int = 4) -> Tuple[np.ndarray, np.ndarray]:
        """Batch gather of fixed-size records → (flat uint8 [n, record_size],
        labels [n]). The native path memcpy's in parallel."""
        indices = np.ascontiguousarray(indices, np.int64)
        n = len(indices)
        record_size = record_size or self.record_size(0)
        out = np.empty((n, record_size), np.uint8)
        labels = np.empty(n, np.int64)
        if self._lib is not None:
            self._lib.spack_gather(
                self._h, indices.ctypes.data, n, out.ctypes.data,
                record_size, labels.ctypes.data, threads,
            )
        else:
            for j, i in enumerate(indices):
                off = int(self._index["offset"][i])
                out[j] = np.frombuffer(
                    self._mm[off : off + record_size], np.uint8)
                labels[j] = self._index["label"][i]
        return out, labels

    def close(self):
        if self._lib is not None and self._h:
            self._lib.spack_close(self._h)
            self._h = None


class SpackDataset:
    """ArrayDataset-compatible view over a spack of fixed-size raw images
    (plug into BatchIterator via .data/.targets style access)."""

    def __init__(self, path: str, shape: Tuple[int, int, int],
                 num_classes: int):
        self.reader = SpackReader(path)
        self.shape = shape
        self.num_classes = num_classes
        self.targets = self.reader.labels()

    def __len__(self):
        return len(self.reader)

    def batch(self, indices: np.ndarray):
        flat, labels = self.reader.gather(np.asarray(indices))
        return flat.reshape((-1,) + self.shape), labels
