"""Round-3 slicing parity additions from the reference spine
(/root/reference/dask_array/tests/test_slicing.py): unknown-chunk fancy
indexing (incl. nonzero-driven nan chunks), dask bool/int indexers across
axes, index dtypes, out-of-bounds at compute time, setitem with unknown
shapes, and stacked from_array identity."""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


@pytest.fixture
def rng():
    return np.random.default_rng(43)


def test_slicing_and_chunks_windows():
    o = da.ones((24, 16), chunks=((4, 8, 8, 4), (2, 6, 6, 2)))
    t = o[4:-4, 2:-2]
    assert t.chunks == ((8, 8), (6, 6))


def test_mixed_index_array_int_slices():
    da_array = da.ones((1, 1, 31, 40))
    new = da_array[(np.array([0]), 0, slice(None), slice(None))]
    assert isinstance(new, da.Array)
    assert_eq(new, np.ones((1, 31, 40)))


@pytest.mark.parametrize("chunks", [1, 2, 3])
def test_index_with_int_dask_array_nanchunks(chunks):
    # slice by an array with nan-sized chunks (nonzero output)
    a = da.arange(-2, 3, chunks=chunks)
    assert_eq(a[a.nonzero()], np.array([-2, -1, 1, 2]))
    # edge case: the nan-sized chunks resolve to size 0
    z = da.zeros(5, chunks=chunks)
    assert_eq(z[z.nonzero()], np.array([]))


@pytest.mark.parametrize("chunks", [2, 4])
def test_index_with_int_dask_array_indexerror(chunks):
    a = da.arange(4, chunks=chunks)
    idx = da.from_array(np.array([4]), chunks=1)
    with pytest.raises(IndexError):
        a[idx].compute()
    idx = da.from_array(np.array([-5]), chunks=1)
    with pytest.raises(IndexError):
        a[idx].compute()


@pytest.mark.parametrize(
    "dtype", ["int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64"]
)
def test_index_with_int_dask_array_dtypes(dtype):
    a = da.from_array(np.array([10, 20, 30, 40]), chunks=-1)
    idx = da.from_array(np.array([1, 2]).astype(dtype), chunks=1)
    assert_eq(a[idx], np.array([20, 30]))


def test_index_with_bool_dask_array():
    x = np.arange(36).reshape((6, 6))
    d = da.from_array(x, chunks=(3, 3))
    ind_np = np.asarray([True, True, False, True, False, False], dtype=bool)
    ind = da.from_array(ind_np, chunks=2)
    for index, np_index in [
        (ind, ind_np),
        ((slice(1, 9, 2), ind), (slice(1, 9, 2), ind_np)),
        ((ind, slice(2, 8, 1)), (ind_np, slice(2, 8, 1))),
    ]:
        got = np.asarray(d[index].compute())
        np.testing.assert_array_equal(got, x[np_index])


def test_index_with_bool_dask_array_2(rng):
    x = rng.random((10, 10, 10))
    ind = rng.random(10) > 0.5
    d = da.from_array(x, chunks=(3, 4, 5))
    dind = da.from_array(ind, chunks=4)
    index = [slice(1, 9, 1), slice(None)]
    for i in range(x.ndim):
        index2 = index[:]
        index2.insert(i, dind)
        index3 = index[:]
        index3.insert(i, ind)
        got = np.asarray(d[tuple(index2)].compute())
        np.testing.assert_array_equal(got, x[tuple(index3)])


def test_gh4043_stacked_from_array_variants():
    for asarray in [True, None]:
        a1 = da.from_array(np.zeros(3), chunks=1, asarray=asarray)
        a2 = da.from_array(np.ones(3), chunks=1, asarray=asarray)
        al = da.stack([a1, a2])
        assert_eq(al, np.stack([np.zeros(3), np.ones(3)]))


def test_unknown_chunks_flatnonzero_indexing():
    a = np.arange(256, dtype=int)
    arr = da.from_array(a, chunks=(256,))
    result = np.flatnonzero(arr)
    assert_eq(result[[0, -1]], np.flatnonzero(a)[[0, -1]])
    result = da.flatnonzero(arr)
    assert_eq(result[[0, -1]], np.flatnonzero(a)[[0, -1]])


def test_boolean_mask_setitem_with_unknown_shape():
    """setitem through a boolean mask whose shape is unknown (nan chunks on
    both sides — reference test_boolean_mask_with_unknown_shape)."""
    base = np.arange(20.0)
    x = da.from_array(base.copy(), chunks=5)
    x = x[x >= 0]  # unknown chunks, same data
    mask = da.from_array(base % 2 == 0, chunks=5)
    mask = mask[da.from_array(np.ones(20, bool), chunks=5)]  # unknown too
    x[mask] = 2
    expected = base.copy()
    expected[base % 2 == 0] = 2
    got = np.asarray(x.compute())
    np.testing.assert_array_equal(got, expected)


def test_take_semi_sorted(rng):
    x = da.from_array(rng.random((100, 10)), chunks=(20, 10))
    index = np.concatenate([np.arange(0, 100, 2), np.arange(1, 100, 2)])
    assert_eq(x[index], np.asarray(x.compute())[index])


@pytest.mark.parametrize("size, chunks", [(100, 10), (100, 27)])
def test_shuffle_slice_values(rng, size, chunks):
    x = da.from_array(rng.integers(0, 1000, size=size), chunks=chunks)
    index = np.arange(size)
    rng.shuffle(index)
    assert_eq(x[index], np.asarray(x.compute())[index])


def test_permit_oob_slices():
    """Out-of-bounds SLICES (not ints) are permitted, as in numpy."""
    x = np.arange(10)
    d = da.from_array(x, chunks=3)
    assert_eq(d[5:100], x[5:100])
    assert_eq(d[-100:4], x[-100:4])
    assert_eq(d[-100:100], x[-100:100])


def test_slice_exact_name_from_array():
    d = da.from_array(np.arange(10), chunks=3, name="named-src")
    s = d[2:7]
    # slicing derives a NEW content-addressed collection; the source keeps
    # its pinned name
    assert d.name == "named-src"
    assert s.name != d.name
    assert_eq(s, np.arange(10)[2:7])
