"""spack packed-dataset format: native reader vs python fallback parity."""

import numpy as np
import pytest

from salun.data.pack import SpackReader, SpackDataset, pack_arrays, _native_lib


@pytest.fixture
def packfile(tmp_path, rng):
    data = rng.integers(0, 255, (64, 8, 8, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, 64).astype(np.int64)
    path = str(tmp_path / "test.spack")
    pack_arrays(path, data, labels)
    return path, data, labels


def test_native_lib_builds():
    assert _native_lib() is not None, "C++ spack library failed to build"


def test_reader_roundtrip(packfile):
    path, data, labels = packfile
    r = SpackReader(path)
    assert len(r) == 64
    np.testing.assert_array_equal(r.labels(), labels)
    got = np.frombuffer(r.get(7), np.uint8).reshape(8, 8, 3)
    np.testing.assert_array_equal(got, data[7])
    r.close()


def test_gather_matches(packfile, rng):
    path, data, labels = packfile
    r = SpackReader(path)
    idx = rng.permutation(64)[:32]
    flat, labs = r.gather(idx, threads=3)
    np.testing.assert_array_equal(flat.reshape(-1, 8, 8, 3), data[idx])
    np.testing.assert_array_equal(labs, labels[idx])
    r.close()


def test_python_fallback_matches(packfile, monkeypatch, rng):
    import salun.data.pack as pack_mod

    path, data, labels = packfile
    monkeypatch.setattr(pack_mod, "_LIB", None)
    monkeypatch.setattr(pack_mod, "_LIB_TRIED", True)
    r = SpackReader(path)
    assert not r.native
    idx = rng.permutation(64)[:16]
    flat, labs = r.gather(idx)
    np.testing.assert_array_equal(flat.reshape(-1, 8, 8, 3), data[idx])
    np.testing.assert_array_equal(labs, labels[idx])


def test_spack_dataset(packfile):
    path, data, labels = packfile
    ds = SpackDataset(path, (8, 8, 3), 10)
    imgs, labs = ds.batch(np.arange(4))
    np.testing.assert_array_equal(imgs, data[:4])
