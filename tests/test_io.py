import os

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


def test_from_map(rng, tmp_path):
    x = rng.standard_normal((12, 5))
    parts = [x[:4], x[4:8], x[8:]]

    calls = []

    def load(i):
        calls.append(i)
        return parts[i]

    d = da.from_map(load, range(3))
    assert calls == [0]  # only the probe call so far (laziness)
    assert d.shape == (12, 5)
    assert d.chunks == ((4, 4, 4), (5,))
    assert_eq(d, x)


def test_from_map_explicit_chunks(rng):
    x = rng.standard_normal((8, 6))

    def load(sl):
        return x[sl]

    slices = [
        (slice(0, 4), slice(0, 6)),
        (slice(4, 8), slice(0, 6)),
    ]
    d = da.from_map(load, slices, chunks=((4, 4), (6,)), shape=(8, 6), dtype=x.dtype)
    assert_eq(d, x)


def test_from_delayed(rng):
    x = rng.standard_normal((5, 5))
    from dask_array_tpu.io import delayed

    d = da.from_delayed(delayed(lambda: x)(), shape=(5, 5), dtype=x.dtype)
    assert_eq(d, x)


def test_from_blocks(rng):
    x = rng.standard_normal((6, 4))
    blocks = {(0, 0): x[:3], (1, 0): x[3:]}
    d = da.from_blocks(blocks, chunks=((3, 3), (4,)))
    assert_eq(d, x)


def test_store_and_regions(rng):
    x = rng.standard_normal((6, 6))
    d = da.from_array(x, chunks=3) + 1
    out = np.zeros((6, 6))
    da.store(d, out)
    np.testing.assert_allclose(out, x + 1)
    big = np.zeros((10, 10))
    da.store(d, big, regions=(slice(2, 8), slice(1, 7)))
    np.testing.assert_allclose(big[2:8, 1:7], x + 1)
    # compute=False returns a handle
    out2 = np.zeros((6, 6))
    handle = da.store(d, out2, compute=False)
    assert out2.sum() == 0
    handle.compute()
    np.testing.assert_allclose(out2, x + 1)


def test_hdf5_roundtrip(rng, tmp_path):
    h5py = pytest.importorskip("h5py")
    x = rng.standard_normal((20, 10))
    d = da.from_array(x, chunks=(5, 10))
    fn = str(tmp_path / "t.h5")
    da.to_hdf5(fn, "/data/x", d)
    with h5py.File(fn, "r") as f:
        np.testing.assert_allclose(f["/data/x"][:], x)
        assert f["/data/x"].chunks == (5, 10)
    from dask_array_tpu.io import from_hdf5

    back = from_hdf5(fn, "/data/x")
    assert back.chunks == ((5,) * 4, (10,))
    assert_eq(back, x)
    # from_array over an open h5py dataset also works
    with h5py.File(fn, "r") as f:
        d2 = da.from_array(f["/data/x"], chunks=(10, 5))
        assert_eq(d2, x)


def test_npy_stack_roundtrip(rng, tmp_path):
    x = rng.standard_normal((12, 7))
    d = da.from_array(x, chunks=(4, 7))
    dirname = str(tmp_path / "stack")
    da.to_npy_stack(dirname, d, axis=0)
    assert sorted(os.listdir(dirname)) == ["0.npy", "1.npy", "2.npy", "info"]
    back = da.from_npy_stack(dirname)
    assert back.chunks == ((4, 4, 4), (7,))
    assert_eq(back, x)


def test_zarr_always_available(tmp_path):
    # zarr IO always RUNS: real package when installed, vendored lite
    # backend otherwise (tests/test_zarr.py covers the full surface)
    with pytest.raises(FileNotFoundError):
        da.from_zarr(str(tmp_path / "nonexistent.zarr"))
    da.to_zarr(da.ones((4,), chunks=2), str(tmp_path / "out.zarr"))
    assert np.allclose(np.asarray(da.from_zarr(str(tmp_path / "out.zarr")).compute()), 1.0)


def test_store_method_and_persist_roundtrip(rng):
    x = rng.standard_normal((4, 4))
    d = da.from_array(x, chunks=2)
    out = np.zeros((4, 4))
    (d * 2).store(out)
    np.testing.assert_allclose(out, x * 2)


def test_review_fixes_io(rng, tmp_path):
    import h5py

    # Array.to_hdf5 method works
    x = rng.standard_normal((4, 4))
    d = da.from_array(x, chunks=2)
    fn = str(tmp_path / "m.h5")
    d.to_hdf5(fn, "/x")
    with h5py.File(fn, "r") as f:
        np.testing.assert_allclose(f["/x"][:], x)

    # store(return_stored=True) with regions returns the stored region
    tgt = np.zeros((8, 8))
    stored = da.store(d + 1, tgt, regions=(slice(2, 6), slice(1, 5)), return_stored=True)
    assert stored.shape == (4, 4)
    np.testing.assert_allclose(stored.compute(), x + 1)

    # from_map with shape only / chunks only
    parts = [x[:2], x[2:]]
    d2 = da.from_map(lambda i: parts[i], range(2), shape=(4, 4), dtype=x.dtype)
    np.testing.assert_allclose(d2.compute(), x)
    d3 = da.from_map(lambda i: parts[i], range(2), chunks=((2, 2), (4,)), dtype=x.dtype)
    np.testing.assert_allclose(d3.compute(), x)
    with pytest.raises(ValueError, match="explicit"):
        da.from_map(lambda i: parts[i], range(2), chunks=(2, 4), dtype=x.dtype)

    # multi-output map_blocks with scalar extra args
    from dask_array_tpu.ops._map_blocks import map_blocks_multi_output

    a, b = map_blocks_multi_output(lambda blk, s: (blk + s, blk * s), d, 2.0, dtypes=["f8", "f8"])
    np.testing.assert_allclose(a.compute(), x + 2.0)
    np.testing.assert_allclose(b.compute(), x * 2.0)


def test_from_graph_external_task_graph(rng):
    """Interop: a hand-built dask-style task graph (parity:
    /root/reference/dask_array/io/_from_graph.py:133)."""
    from dask_array_tpu.io import from_graph

    x = rng.standard_normal((4, 6))

    def half(i):
        return x[i * 2:(i + 1) * 2]

    graph = {
        ("src", 0, 0): (half, 0),
        ("src", 1, 0): (half, 1),
        # nested task + key reference + literal arg
        ("out", 0, 0): (np.add, ("src", 0, 0), (np.multiply, ("src", 0, 0), 0.5)),
        ("out", 1, 0): (np.add, ("src", 1, 0), 1.0),
    }
    arr = from_graph(
        graph, np.empty((0, 0)), ((2, 2), (6,)),
        [("out", 0, 0), ("out", 1, 0)], "out",
    )
    want = np.concatenate([x[:2] * 1.5, x[2:] + 1.0])
    assert_eq(arr, want)
    # graph-built arrays join normal pipelines
    assert_eq(arr.sum(axis=0), want.sum(axis=0))


def test_from_graph_with_dependencies(rng):
    from dask_array_tpu.io import from_graph

    x = rng.standard_normal((6,))
    dep = da.from_array(x, chunks=3) * 2  # lazy dependency collection
    dep_name = dep.expr._name
    graph = {
        ("o", 0): (np.negative, (dep_name, 0)),
        ("o", 1): (np.negative, (dep_name, 1)),
    }
    arr = from_graph(
        graph, np.empty((0,)), ((3, 3),), [("o", 0), ("o", 1)], "o",
        dependencies=(dep,),
    )
    assert_eq(arr, -(x * 2))


def test_from_graph_key_count_mismatch(rng):
    from dask_array_tpu.io import from_graph

    with pytest.raises(ValueError, match="keys"):
        from_graph({}, np.empty((0,)), ((3, 3),), [("o", 0)], "o")
