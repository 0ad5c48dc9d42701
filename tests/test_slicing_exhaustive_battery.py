"""Exhaustive slicing battery.

Ported from ``/root/reference/dask_array/tests/test_slicing.py``:
the exhaustive independent/chained indexer grids (ints, lists, slices,
reversals, None, empties, bool masks), plus the regression spine
(gh3579 reversed-from-zero, minimal-dtype overflow, newaxis after bool,
3-D bool mask, masked fancy take, assignment-time setitem validation).
The chained grid is the reference's @slow 1400-combination loop, sampled
deterministically to keep suite time bounded.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


class ReturnItem:
    def __getitem__(self, item):
        return item


I = ReturnItem()

INDEXERS = [0, -2, I[:], I[:5], [0, 1], [0, 1, 2], [4, 2], I[::-1], None, I[:0], []]


def _eq(npv, dav):
    assert_eq(dav, np.asarray(npv), check_chunks=False, check_dtype=False)


def test_slicing_exhaustively_independent():
    x = np.random.default_rng(0).random((6, 7, 8))
    a = da.from_array(x, chunks=(3, 3, 3))

    for i in INDEXERS:
        _eq(x[i], a[i])
        for j in INDEXERS:
            _eq(x[i][:, j], a[i][:, j])


def test_slicing_exhaustively_repeated_first_axis():
    x = np.random.default_rng(1).random((6, 7, 8))
    a = da.from_array(x, chunks=(3, 3, 3))

    first_indexers = [I[:], I[:5], np.arange(5), [3, 1, 4, 5, 0], np.arange(6) < 6]
    second_indexers = [0, -1, 3, I[:], I[:3], I[2:-1], [2, 4], [], I[:0]]
    for i in first_indexers:
        for j in second_indexers:
            _eq(x[i][j], a[i][j])


def test_slicing_exhaustively_chained_sampled():
    # the reference's @slow triple loop (~1400 combos), deterministically
    # sampled: the full pair loop plus 120 random triples
    x = np.random.default_rng(2).random((6, 7, 8))
    a = da.from_array(x, chunks=(3, 3, 3))

    for i in INDEXERS:
        for j in INDEXERS:
            _eq(x[:, i][j], a[:, i][j])

    rng = np.random.default_rng(3)
    n = len(INDEXERS)
    for _ in range(120):
        i, j, k = (INDEXERS[rng.integers(0, n)] for _ in range(3))
        _eq(x[..., i][:, j][k], a[..., i][:, j][k])


# ---------------------------------------------------------------------------
# regression spine
# ---------------------------------------------------------------------------


def test_gh3579_reversed_slice_from_zero():
    assert_eq(da.arange(10, chunks=3)[0::-1], np.arange(10)[0::-1], check_chunks=False)
    assert_eq(da.arange(10, chunks=3)[::-1], np.arange(10)[::-1], check_chunks=False)


def test_minimal_dtype_doesnt_overflow():
    # a bool take near the end of a >127-chunk array must not compute block
    # offsets in a minimal int8 dtype
    x = np.arange(1980)
    dx = da.from_array(x, chunks=248)
    ib = np.zeros(1980, dtype=bool)
    ib[1560:1860] = True
    assert_eq(dx[ib], x[ib], check_chunks=False)


def test_positional_indexer_newaxis():
    arr = da.from_array(np.array([0, 1, 2]))
    new = arr[[True, True, False], np.newaxis]
    expected = np.array([0, 1, 2])[[True, True, False], np.newaxis]
    assert_eq(new, expected, check_chunks=False)


def test_slice_array_3d_with_bool_numpy_array():
    # dask#6089
    array = da.from_array(np.arange(0, 24).reshape((4, 3, 2)), chunks=(2, 2, 1))
    mask = np.arange(0, 24).reshape((4, 3, 2)) > 12
    assert_eq(array[mask], np.arange(13, 24), check_chunks=False)


def test_slice_masked_arrays():
    arr = np.ma.array(range(8), mask=[0, 0, 1, 0, 0, 1, 0, 1])
    darr = da.from_array(arr, chunks=(4,))
    out = darr[[2, 6]].compute()
    expected = arr[[2, 6]]
    assert isinstance(out, np.ma.MaskedArray)
    np.testing.assert_array_equal(np.ma.getmaskarray(out), np.ma.getmaskarray(expected))
    np.testing.assert_array_equal(out.filled(0), expected.filled(0))


def test_setitem_errors_raise_at_assignment_time():
    x = da.ones((10, 10), chunks=(5, 5))
    with pytest.raises(ValueError):
        x[:5, :5] = np.ones((6, 6))
    with pytest.raises(ValueError):
        x[:5, :5] = np.ones((2, 5, 5))


def test_setitem_with_bool_mask_preserves_shape():
    # dask#3730 family: mutating through a differently-chunked mask must not
    # lose the output chunk structure
    for array_size, c1, c2 in [((100,), 50, 37), ((100,), 25, 40)]:
        x = da.zeros(array_size, chunks=c1)
        mask = np.zeros(array_size, dtype=bool)
        mask[::3] = True
        x[da.from_array(mask, chunks=c2)] = 1
        result = x.compute()
        assert x.shape == np.asarray(result).shape
        expected = np.zeros(array_size)
        expected[mask] = 1
        np.testing.assert_array_equal(np.asarray(result), expected)


def test_empty_slice_of_empty_list():
    x = np.random.default_rng(4).random((6, 7))
    a = da.from_array(x, chunks=(3, 3))
    _eq(x[[]][:0], a[[]][:0])
    _eq(x[:0][[]], a[:0][[]])


def test_uneven_boundary_singleton():
    # singleton slice landing exactly on an uneven block boundary
    x = np.arange(30)
    a = da.from_array(x, chunks=((7, 12, 9, 2),))
    for i in [6, 7, 18, 19, 27, 28, 29, -1, -30]:
        _eq(x[i : i + 1 or None] if i != -30 else x[-30:-29], a[i : i + 1 or None] if i != -30 else a[-30:-29])
        _eq(x[i], a[i])
