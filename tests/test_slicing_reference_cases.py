"""Reference test_slicing.py case ports (the big slicing family).

Behavior-level ports of the reference's ``tests/test_slicing.py`` cases
this suite didn't already cover: mixed indices, list indexers, None/int/
ellipsis combinations, uneven chunks, int-dask-array indexing matrices,
bool-dask-array routing, OOB checks, identities, and name consistency.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


@pytest.fixture
def rng():
    return np.random.default_rng(101)


def test_mixed_index(rng):
    x = rng.standard_normal((10, 10, 10))
    d = da.from_array(x, chunks=3)
    assert_eq(d[5, :, 2:8], x[5, :, 2:8])
    assert_eq(d[2:9, 4, ::2], x[2:9, 4, ::2])
    assert_eq(d[:, [1, 3, 5], 2], x[:, [1, 3, 5], 2])


def test_slicing_identities(rng):
    x = rng.standard_normal((12, 8))
    d = da.from_array(x, chunks=4)
    for ident in (np.s_[:], np.s_[0:12], np.s_[::1], np.s_[..., :]):
        assert d[ident].expr.simplify()._name == d.expr._name


def test_slice_stop_0(rng):
    d = da.from_array(rng.standard_normal((5,)), chunks=2)
    assert d[:0].shape == (0,)
    assert np.asarray(d[:0].compute()).shape == (0,)


def test_slice_list_then_none(rng):
    x = rng.standard_normal((10,))
    d = da.from_array(x, chunks=4)
    assert_eq(d[[2, 5, 7]][None], x[[2, 5, 7]][None])


def test_chained_getitem_after_list_indexer(rng):
    x = rng.standard_normal((20,))
    d = da.from_array(x, chunks=5)
    assert_eq(d[[3, 7, 11, 15]][1:3], x[[3, 7, 11, 15]][1:3])
    assert_eq(d[[3, 7, 11, 15]][::-1], x[[3, 7, 11, 15]][::-1])


def test_empty_list(rng):
    x = rng.standard_normal((8, 4))
    d = da.from_array(x, chunks=3)
    got = d[[]]
    assert got.shape == (0, 4)
    assert np.asarray(got.compute()).shape == (0, 4)


def test_boolean_list_and_numpy_slicing(rng):
    x = rng.standard_normal((6,))
    d = da.from_array(x, chunks=2)
    mask = [True, False, True, True, False, True]
    assert_eq(d[mask], x[np.asarray(mask)])
    assert_eq(d[np.asarray(mask)], x[np.asarray(mask)])


def test_multiple_list_slicing_is_pointwise(rng):
    # capability extension over the reference: where it raises and suggests
    # .vindex, multiple advanced indices follow numpy semantics directly
    x = rng.standard_normal((5, 5))
    d = da.from_array(x, chunks=2)
    assert_eq(d[[1, 2], [3, 4]], x[[1, 2], [3, 4]])


def test_uneven_chunks_slicing(rng):
    x = rng.standard_normal((20,))
    d = da.from_array(x, chunks=(3, 7, 5, 5))
    for slc in (np.s_[2:15], np.s_[::2], np.s_[18:1:-3], np.s_[9]):
        assert_eq(d[slc], x[slc])


def test_slicing_consistent_names(rng):
    x = rng.standard_normal((10,))
    a = da.from_array(x, chunks=5)
    assert a[0:5].expr._name == a[0:5].expr._name
    assert a[0:5].expr._name != a[1:6].expr._name
    # normalization: equivalent spellings share names
    assert a[0:5:1].expr._name == a[:5].expr._name
    assert a[-10:5].expr._name == a[:5].expr._name


def test_oob_check(rng):
    d = da.from_array(rng.standard_normal((5, 5)), chunks=2)
    with pytest.raises(IndexError):
        d[5]
    with pytest.raises(IndexError):
        d[:, -6]
    with pytest.raises(IndexError):
        d[0, 0, 0]
    # OOB *slices* are permitted (numpy semantics)
    assert_eq(d[3:100], np.asarray(d.compute())[3:100])


def test_negative_n_slicing(rng):
    x = rng.standard_normal((10,))
    d = da.from_array(x, chunks=3)
    assert_eq(d[-5:], x[-5:])
    assert_eq(d[:-5], x[:-5])
    assert_eq(d[-8:-2], x[-8:-2])


def test_negative_list_slicing(rng):
    x = rng.standard_normal((10,))
    d = da.from_array(x, chunks=3)
    assert_eq(d[[-1, -5, 2]], x[[-1, -5, 2]])


# -- int-dask-array indexing matrix (parity: test_index_with_int_dask_array*)


@pytest.mark.parametrize("x_chunks", [(3, 5), (5, 3), (5, 5)])
@pytest.mark.parametrize("idx_chunks", [1, 2, 3])
def test_index_with_int_dask_array_matrix(rng, x_chunks, idx_chunks):
    x = rng.standard_normal((5, 10))
    idx = np.array([3, 0, 9, 9, 4])
    d = da.from_array(x, chunks=x_chunks)
    di = da.from_array(idx, chunks=idx_chunks)
    assert_eq(d[:, di], x[:, idx])


def test_index_with_int_dask_array_0d(rng):
    x = rng.standard_normal((8,))
    d = da.from_array(x, chunks=3)
    i = da.from_array(np.array(5), chunks=())
    got = d[i]
    assert_eq(got, x[5])


def test_index_with_int_dask_array_negindex(rng):
    x = rng.standard_normal((8,))
    d = da.from_array(x, chunks=3)
    di = da.from_array(np.array([-1, -8, 3]), chunks=2)
    assert_eq(d[di], x[[-1, -8, 3]])


@pytest.mark.parametrize("dtype", ["int8", "int16", "int32", "int64", "uint8"])
def test_index_with_int_dask_array_dtypes(rng, dtype):
    x = rng.standard_normal((8,))
    d = da.from_array(x, chunks=3)
    di = da.from_array(np.array([0, 3, 7], dtype=dtype), chunks=2)
    assert_eq(d[di], x[[0, 3, 7]])


def test_index_with_bool_dask_array_per_axis(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    m0 = x[:, 0] > 0
    got = d[da.from_array(m0, chunks=3)]
    np.testing.assert_allclose(np.asarray(got.compute()), x[m0])
    m1 = x[0] > 0
    got2 = d[:, da.from_array(m1, chunks=4)]
    np.testing.assert_allclose(np.asarray(got2.compute()), x[:, m1])


# -- None / int / ellipsis combinations ------------------------------------------


@pytest.mark.parametrize(
    "index",
    [
        np.s_[None],
        np.s_[None, :, 2],
        np.s_[:, None, 1:4],
        np.s_[2, None, ...],
        np.s_[..., None],
        np.s_[None, ..., None],
        np.s_[1:3, None, 2:5, None],
    ],
)
def test_slicing_with_nones(rng, index):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    assert_eq(d[index], x[index])


@pytest.mark.parametrize("a", [np.s_[:], np.s_[1], None, np.s_[...]])
@pytest.mark.parametrize("b", [np.s_[:], np.s_[1], None])
def test_slicing_none_int_ellipsis_grid(rng, a, b):
    x = rng.standard_normal((5, 5))
    d = da.from_array(x, chunks=2)
    idx = (a, b)
    if sum(1 for i in idx if i is not None and i is not Ellipsis and not isinstance(i, slice)) > 2:
        pytest.skip("over-indexed")
    try:
        want = x[idx]
    except IndexError:
        with pytest.raises(IndexError):
            d[idx].compute()
        return
    assert_eq(d[idx], want)


def test_take_sorted_and_unsorted(rng):
    x = rng.standard_normal((30,))
    d = da.from_array(x, chunks=7)
    sorted_idx = np.array([1, 5, 6, 20, 29])
    assert_eq(da.take(d, sorted_idx), np.take(x, sorted_idx))
    unsorted = np.array([29, 1, 14, 2, 14])
    assert_eq(da.take(d, unsorted), np.take(x, unsorted))


def test_take_2d_axis1(rng):
    x = rng.standard_normal((4, 12))
    d = da.from_array(x, chunks=(2, 4))
    idx = np.array([[0, 11], [5, 5]])
    assert_eq(da.take(d, idx, axis=1), np.take(x, idx, axis=1))


def test_slice_array_null_dimension(rng):
    d = da.from_array(np.zeros((3, 0)), chunks=3)
    assert np.asarray(d[0].compute()).shape == (0,)


def test_vindex_reference_semantics(rng):
    # vindex with single indexed axis moves vectorized dims to front
    x = rng.standard_normal((4, 5, 6))
    d = da.from_array(x, chunks=2)
    got = d.vindex[:, [1, 3], :]
    assert got.shape == (2, 4, 6)
    np.testing.assert_allclose(
        np.asarray(got.compute()), np.moveaxis(x[:, [1, 3], :], 1, 0)
    )


def test_slice_construction_is_metadata_only(rng, monkeypatch):
    # building slices must not lower or execute anything
    import dask_array_tpu._executor as ex

    def boom(*a, **k):
        raise AssertionError("execute called during graph construction")

    monkeypatch.setattr(ex, "execute", boom)
    d = da.ones((100, 100), chunks=10)
    y = d[5:50][::2][:, 3]
    assert y.shape == (23,)
    assert y.chunks is not None
