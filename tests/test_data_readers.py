"""Dataset reader tests against synthesized on-disk formats."""

import os
import pickle

import numpy as np
import pytest


def test_cifar10_reader(tmp_path, rng):
    from salun.data.datasets import cifar10

    base = tmp_path / "cifar-10-batches-py"
    os.makedirs(base)
    all_data, all_labels = [], []
    for b in range(1, 6):
        data = rng.integers(0, 255, (20, 3072), dtype=np.uint8)
        labels = rng.integers(0, 10, 20).tolist()
        with open(base / f"data_batch_{b}", "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
        all_data.append(data)
        all_labels.extend(labels)
    test_data = rng.integers(0, 255, (10, 3072), dtype=np.uint8)
    with open(base / "test_batch", "wb") as f:
        pickle.dump({b"data": test_data, b"labels": [0] * 10}, f)

    ds = cifar10(str(tmp_path), train=True)
    assert ds.data.shape == (100, 32, 32, 3)
    np.testing.assert_array_equal(ds.targets, np.asarray(all_labels))
    # layout: CHW planes → HWC
    want = np.concatenate(all_data).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ds.data, want)

    ts = cifar10(str(tmp_path), train=False)
    assert ts.data.shape == (10, 32, 32, 3)


def test_svhn_reader(tmp_path, rng):
    import scipy.io

    from salun.data.datasets import svhn

    X = rng.integers(0, 255, (32, 32, 3, 15), dtype=np.uint8)  # HWCN
    y = rng.integers(1, 11, (15, 1)).astype(np.uint8)  # SVHN 1..10
    scipy.io.savemat(tmp_path / "train_32x32.mat", {"X": X, "y": y})
    ds = svhn(str(tmp_path), train=True)
    assert ds.data.shape == (15, 32, 32, 3)
    np.testing.assert_array_equal(ds.data[3], X[..., 3])
    # label 10 → 0
    want = y.squeeze().astype(np.int64)
    want[want == 10] = 0
    np.testing.assert_array_equal(ds.targets, want)


def test_stl10_reader(tmp_path, rng):
    from salun.data.ddpm_data import _stl10

    base = tmp_path / "stl10_binary"
    os.makedirs(base)
    n = 6
    x = rng.integers(0, 255, (n, 3, 96, 96), dtype=np.uint8)
    y = rng.integers(1, 11, n).astype(np.uint8)
    x.tofile(base / "train_X.bin")
    y.tofile(base / "train_y.bin")
    ds = _stl10(str(tmp_path), train=True)
    assert ds.data.shape == (n, 96, 96, 3)
    np.testing.assert_array_equal(ds.targets, (y - 1).astype(np.int64))
    # STL-10 binary is column-major per channel: x[n,c] transposed
    np.testing.assert_array_equal(ds.data[0], x[0].transpose(2, 1, 0))


def test_ddpm_data_helpers(rng):
    from salun.data.datasets import synthetic
    from salun.data.ddpm_data import (
        all_but_one_class_dataset, get_forget_dataset, save_base_dataset,
    )

    ds = synthetic(n=200, num_classes=10, seed=0)
    remain, forget = get_forget_dataset(ds, 3)
    assert (forget.targets == 3).all()
    assert (remain.targets != 3).all()
    assert len(remain) + len(forget) == len(ds)

    base = save_base_dataset(ds, excluded_class=3, per_class=5)
    assert (base.targets != 3).all()
    assert len(base) <= 9 * 5

    rem = all_but_one_class_dataset(ds, 0)
    assert (rem.targets != 0).all()
