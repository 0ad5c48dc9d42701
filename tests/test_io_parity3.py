"""Round-3 IO parity additions from the reference spine
(tests/test_hdf5.py, tests/test_npy_stack.py): hdf5 chunk-spec variants,
multiple datasets, roundtrips through from_array of live datasets, and
npy-stack axis/mmap/sliced reads."""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq

h5py = pytest.importorskip("h5py")


def test_to_hdf5_method(tmp_path):
    x = da.ones((4, 4), chunks=(2, 2))
    fn = str(tmp_path / "a.hdf5")
    x.to_hdf5(fn, "/x")
    with h5py.File(fn, mode="r") as f:
        d = f["/x"]
        assert_eq(d[:], x)
        assert d.chunks == (2, 2)


def test_to_hdf5_chunks_none(tmp_path):
    x = da.ones((4, 4), chunks=(2, 2))
    fn = str(tmp_path / "a.hdf5")
    x.to_hdf5(fn, "/x", chunks=None)
    with h5py.File(fn, mode="r") as f:
        d = f["/x"]
        assert_eq(d[:], x)
        assert d.chunks is None


def test_to_hdf5_explicit_chunks(tmp_path):
    x = da.ones((4, 4), chunks=(2, 2))
    fn = str(tmp_path / "a.hdf5")
    x.to_hdf5(fn, "/x", chunks=(1, 1))
    with h5py.File(fn, mode="r") as f:
        d = f["/x"]
        assert_eq(d[:], x)
        assert d.chunks == (1, 1)


def test_to_hdf5_multiple_datasets(tmp_path):
    x = da.ones((4, 4), chunks=(2, 2))
    y = da.ones(4, chunks=2, dtype="i4")
    fn = str(tmp_path / "a.hdf5")
    da.to_hdf5(fn, {"/x": x, "/y": y})
    with h5py.File(fn, mode="r") as f:
        assert_eq(f["/x"][:], x)
        assert f["/x"].chunks == (2, 2)
        assert_eq(f["/y"][:], y)
        assert f["/y"].chunks == (2,)


def test_to_hdf5_bad_args(tmp_path):
    fn = str(tmp_path / "a.hdf5")
    with pytest.raises(ValueError):
        da.to_hdf5(fn, "/x", da.ones(4), "extra")
    with pytest.raises(ValueError):
        da.to_hdf5(fn)


def test_hdf5_dataset_from_array_storage_chunks(tmp_path):
    """from_array of a live h5py dataset defaults to the STORAGE granules."""
    x = np.arange(24.0).reshape(4, 6)
    fn = str(tmp_path / "a.hdf5")
    with h5py.File(fn, mode="w") as f:
        f.create_dataset("/data/x", data=x, chunks=(2, 3))
    with h5py.File(fn, mode="r") as f:
        d = da.from_array(f["/data/x"])
        # auto-chunking may merge granules, but stays granule-ALIGNED
        assert all(c % g == 0 for cs, g in zip(d.chunks, (2, 3)) for c in cs)
        assert_eq(d, x)
        e = da.from_array(f["/data/x"], chunks=(2, 3), name="x-roundtrip")
        assert e.name == "x-roundtrip"
        assert_eq(e, x)


def test_to_npy_stack_roundtrip(tmp_path):
    x = np.arange(48.0).reshape(4, 12)
    d = da.from_array(x, chunks=(2, 12))
    dirname = str(tmp_path / "stack")
    da.to_npy_stack(dirname, d)
    back = da.from_npy_stack(dirname)
    assert_eq(back, x)


@pytest.mark.parametrize("axis", [0, 1])
def test_npy_stack_roundtrip_axis(tmp_path, axis):
    x = np.arange(60.0).reshape(6, 10)
    d = da.from_array(x, chunks=(3, 5))
    dirname = str(tmp_path / f"stack{axis}")
    da.to_npy_stack(dirname, d, axis=axis)
    back = da.from_npy_stack(dirname)
    assert_eq(back, x)


@pytest.mark.parametrize("mmap_mode", ["r", None])
def test_npy_stack_mmap_mode(tmp_path, mmap_mode):
    x = np.arange(20.0).reshape(4, 5)
    d = da.from_array(x, chunks=(2, 5))
    dirname = str(tmp_path / "stackm")
    da.to_npy_stack(dirname, d)
    back = da.from_npy_stack(dirname, mmap_mode=mmap_mode)
    assert_eq(back, x)


def test_npy_stack_sliced_and_rechunked_read(tmp_path):
    x = np.arange(120.0).reshape(12, 10)
    d = da.from_array(x, chunks=(3, 10))
    dirname = str(tmp_path / "stacks")
    da.to_npy_stack(dirname, d)
    back = da.from_npy_stack(dirname)
    assert_eq(back[2:10, 1:9], x[2:10, 1:9])
    assert_eq(back.rechunk((6, 5)).sum(axis=0), x.sum(axis=0))
