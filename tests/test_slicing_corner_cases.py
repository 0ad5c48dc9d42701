"""Slicing corner cases ported from the reference's test_slicing.py.

Case sources: test_oob_check, test_pathological_unsorted_slicing,
test_take_semi_sorted, test_slice_stop_0, test_empty_list,
test_slice_list_then_None, test_slicing_none_int_ellipses,
test_None_overlap_int, test_negative_n_slicing,
test_slice_array_3d_with_bool_numpy_array, test_minimal_dtype,
test_vindex_single_indexed_axis_moves_vectorized_dimensions_to_front,
test_setitem_with_different_chunks_preserves_shape,
test_setitem_errors_raise_at_assignment_time.
"""

from __future__ import annotations

import numpy as np
import pytest

import dask_array_tpu as da


@pytest.fixture
def rng():
    return np.random.default_rng(41)


@pytest.fixture
def xd(rng):
    x = rng.standard_normal((20, 24))
    return x, da.from_array(x, chunks=(7, 5))


def eq(a, b, **kw):
    got = np.asarray(a.compute())
    assert got.shape == b.shape
    np.testing.assert_allclose(got, b, **kw)


def test_oob(xd):
    x, d = xd
    eq(d[15:99], x[15:99])  # oob slices are permitted (numpy semantics)
    with pytest.raises(IndexError):
        d[25]
    with pytest.raises(IndexError):
        d[:, -30]


def test_pathological_unsorted_and_semi_sorted(xd):
    x, d = xd
    eq(d[np.array([9, 1, 5, 1, 9, 3])], x[[9, 1, 5, 1, 9, 3]])
    eq(da.take(d, np.array([2, 3, 5, 17, 18]), axis=0), np.take(x, [2, 3, 5, 17, 18], axis=0))


def test_empty_selections(xd):
    x, d = xd
    eq(d[:0], x[:0])
    eq(d[[]], x[[]])


def test_none_int_ellipsis_combos(xd):
    x, d = xd
    eq(d[[1, 3]][None], x[[1, 3]][None])
    eq(d[None, ..., 1], x[None, ..., 1])
    eq(d[1, None, :], x[1, None, :])


def test_negative_steps(xd):
    x, d = xd
    eq(d[::-1, ::-2], x[::-1, ::-2])
    eq(d[::-1][3:10], x[::-1][3:10])
    eq(d[::11], x[::11])


def test_bool_mask_shapes(rng, xd):
    x, d = xd
    m = x > 0
    np.testing.assert_allclose(
        np.asarray(d[da.from_array(m, chunks=(7, 5))].compute()), x[m]
    )
    y = rng.standard_normal((4, 5, 6))
    dy = da.from_array(y, chunks=2)
    m1 = np.array([True, False, True, False])
    np.testing.assert_allclose(np.asarray(dy[m1].compute()), y[m1])


def test_small_index_dtype_no_overflow(rng):
    y = rng.standard_normal(300)
    dy = da.from_array(y, chunks=100)
    idx = np.array([299, 0, 150], dtype=np.int16)
    eq(dy[idx], y[idx])


def test_vindex_vectorized_dims_to_front(rng):
    y = rng.standard_normal((4, 5, 6))
    dy = da.from_array(y, chunks=2)
    got = np.asarray(dy.vindex[:, [0, 2], [1, 3]].compute())
    want = np.stack([y[:, 0, 1], y[:, 2, 3]], axis=0)
    np.testing.assert_allclose(got, want)


def test_setitem_value_with_different_chunks(rng, xd):
    x, _ = xd
    dd = da.from_array(x, chunks=(7, 5))
    val = da.from_array(rng.standard_normal((5, 24)), chunks=(2, 9))
    dd[10:15] = val
    y = x.copy()
    y[10:15] = np.asarray(val.compute())
    np.testing.assert_allclose(np.asarray(dd.compute()), y)


def test_setitem_errors_raise_at_assignment_time(xd):
    x, _ = xd
    dd = da.from_array(x, chunks=(7, 5))
    with pytest.raises(ValueError, match="broadcast"):
        dd[0:3] = da.ones((99, 24))
    with pytest.raises(ValueError, match="broadcast"):
        dd[0, 0] = np.ones((2, 2))
    # valid broadcasts pass the assignment-time check
    dd[0:3] = da.ones((1, 24))
    dd[:, 2:4] = 5.0
    y = x.copy()
    y[0:3] = 1.0
    y[:, 2:4] = 5.0
    np.testing.assert_allclose(np.asarray(dd.compute()), y)
