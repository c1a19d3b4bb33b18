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


def test_cifar100_reader_and_tar_extraction(tmp_path, rng):
    """cifar-100-python in the real pickle layout, reached through the
    tar.gz auto-extraction path (datasets.py _maybe_extract)."""
    import tarfile

    from salun.data.datasets import cifar100

    stage = tmp_path / "stage" / "cifar-100-python"
    os.makedirs(stage)
    data = rng.integers(0, 255, (30, 3072), dtype=np.uint8)
    fine = rng.integers(0, 100, 30).tolist()
    with open(stage / "train", "wb") as f:
        pickle.dump({b"data": data, b"fine_labels": fine}, f)
    with open(stage / "test", "wb") as f:
        pickle.dump({b"data": data[:7], b"fine_labels": fine[:7]}, f)
    with tarfile.open(tmp_path / "cifar-100-python.tar.gz", "w:gz") as tf:
        tf.add(stage, arcname="cifar-100-python")

    ds = cifar100(str(tmp_path), train=True)  # extracts the archive
    assert ds.data.shape == (30, 32, 32, 3)
    assert ds.num_classes == 100
    np.testing.assert_array_equal(ds.targets, np.asarray(fine))
    want = data.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ds.data, want)
    assert len(cifar100(str(tmp_path), train=False)) == 7


def test_tiny_imagenet_reader(tmp_path, rng):
    """2-class tiny-imagenet-200 tree (train folders + val annotations),
    wnid-sorted class ids (parity: Classification/dataset.py:372-430)."""
    from PIL import Image

    from salun.data.datasets import tiny_imagenet

    wnids = ["n02124075", "n01443537"]  # deliberately unsorted
    (tmp_path / "wnids.txt").write_text("\n".join(wnids) + "\n")
    imgs = {}
    for w in wnids:
        d = tmp_path / "train" / w / "images"
        os.makedirs(d)
        for i in range(3):
            arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            # PNG content under .JPEG name: lossless (PIL sniffs content)
            Image.fromarray(arr).save(d / f"{w}_{i}.JPEG", format="PNG")
            imgs[f"{w}_{i}"] = arr

    val_dir = tmp_path / "val" / "images"
    os.makedirs(val_dir)
    lines = []
    for i, w in enumerate(wnids * 2):
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(val_dir / f"val_{i}.JPEG", format="PNG")
        lines.append(f"val_{i}.JPEG\t{w}\t0\t0\t10\t10")
    (tmp_path / "val" / "val_annotations.txt").write_text(
        "\n".join(lines) + "\n")

    train = tiny_imagenet(str(tmp_path), train=True)
    assert train.data.shape == (6, 64, 64, 3)
    assert train.num_classes == 200
    # classes ordered by SORTED wnid: n01443537 → 0, n02124075 → 1; the
    # reader also WALKS folders in sorted-wnid order, so class 0 comes first
    np.testing.assert_array_equal(np.sort(np.unique(train.targets)), [0, 1])
    assert (train.targets[:3] == 0).all()
    np.testing.assert_array_equal(train.data[0], imgs["n01443537_0"])

    val = tiny_imagenet(str(tmp_path), train=False)
    assert val.data.shape == (4, 64, 64, 3)
    np.testing.assert_array_equal(val.targets, [1, 0, 1, 0])


def test_preflight_assets_script(tmp_path):
    """scripts/preflight_assets.py: missing → rc 1 + names the gaps;
    a good-checksum artifact reports ok."""
    import hashlib
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "preflight_assets",
        os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                     "preflight_assets.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    payload = b"fake svhn payload"
    (tmp_path / "train_32x32.mat").write_bytes(payload)
    mod.ARTIFACTS["svhn_train"] = (
        "train_32x32.mat", hashlib.md5(payload).hexdigest(), "test")

    results = mod.check(str(tmp_path))
    assert results["svhn_train"]["status"] == "ok"
    assert results["cifar10"]["status"] == "MISSING"
    assert mod.main(["--root", str(tmp_path), "--json"]) == 1


def test_imagenet_loader_local_hf_dataset(tmp_path, rng):
    """ImageNetLoader on a real on-disk HF DatasetDict (the zero-egress
    deployment path: datasets.save_to_disk → load_from_disk). Exercises
    decode→resize, forget/retain splitting (imagenet.py:135-166), tail
    padding with zero weights, and the prefetch pipeline."""
    datasets = pytest.importorskip("datasets")
    from PIL import Image

    from salun.data.imagenet import ImageNetLoader, get_x_y_from_data_dict

    def imgs(n):
        return [Image.fromarray(
            rng.integers(0, 255, (30, 40, 3), dtype=np.uint8)) for _ in
            range(n)]

    n_train = 23
    labels = rng.integers(0, 5, n_train).tolist()
    labels[:4] = [2, 2, 2, 2]  # ensure class 2 has members
    dd = datasets.DatasetDict({
        "train": datasets.Dataset.from_dict(
            {"image": imgs(n_train), "label": labels}),
        "validation": datasets.Dataset.from_dict(
            {"image": imgs(5), "label": rng.integers(0, 5, 5).tolist()}),
    })
    root = tmp_path / "hfds"
    dd.save_to_disk(str(root))

    loader = ImageNetLoader(str(root), batch_size=8, image_size=16, seed=0)
    forget, retain = loader.forget_retain_indices(2)
    assert set(np.asarray(labels)[forget]) == {2}
    assert not (np.asarray(labels)[retain] == 2).any()
    assert len(forget) + len(retain) == n_train

    ls = loader.loaders(class_to_replace=2)
    batches = list(ls["retain"]())
    seen = sum(int(b["weight"].sum()) for b in batches)
    assert seen == len(retain)
    for b in batches:
        assert b["image"].shape == (8, 16, 16, 3)
        assert b["image"].dtype == np.uint8
        x, y = get_x_y_from_data_dict(b)
        assert x.shape[0] == y.shape[0] == 8
    # padded tail rows carry weight 0
    last = batches[-1]
    assert (last["weight"] == 0).sum() == 8 * len(batches) - len(retain)

    val = list(ls["val"]())
    assert sum(int(b["weight"].sum()) for b in val) == 5
