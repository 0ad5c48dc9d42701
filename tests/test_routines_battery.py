"""Routines long-tail battery: every routine executes and matches numpy."""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


@pytest.fixture
def rng():
    return np.random.default_rng(89)


def test_unique_variants(rng):
    x = rng.integers(0, 8, (40,))
    d = da.from_array(x, chunks=10)
    assert_eq(da.unique(d), np.unique(x))
    vals, counts = da.unique(d, return_counts=True)
    evals, ecounts = np.unique(x, return_counts=True)
    assert_eq(vals, evals)
    assert_eq(counts, ecounts, check_dtype=False)


def test_digitize(rng):
    x = rng.uniform(0, 10, (30,))
    bins = np.array([2.0, 4.0, 6.5, 9.0])
    d = da.from_array(x, chunks=6)
    assert_eq(da.digitize(d, bins), np.digitize(x, bins), check_dtype=False)
    assert_eq(da.digitize(d, bins, right=True), np.digitize(x, bins, right=True), check_dtype=False)


def test_cov_corrcoef(rng):
    x = rng.standard_normal((5, 40))
    d = da.from_array(x, chunks=(5, 10))
    assert_eq(da.cov(d), np.cov(x), rtol=1e-10)
    assert_eq(da.corrcoef(d), np.corrcoef(x), rtol=1e-10)
    assert_eq(da.cov(d, rowvar=False), np.cov(x, rowvar=False), rtol=1e-10)


def test_average_weights(rng):
    x = rng.standard_normal((12, 5))
    w = rng.uniform(0.5, 2.0, (12,))
    d = da.from_array(x, chunks=(4, 5))
    assert_eq(da.average(d, axis=0), np.average(x, axis=0), rtol=1e-10)
    assert_eq(
        da.average(d, axis=0, weights=da.from_array(w, chunks=4)),
        np.average(x, axis=0, weights=w),
        rtol=1e-10,
    )
    got, s = da.average(d, axis=0, weights=da.from_array(w, chunks=4), returned=True)
    want, ws = np.average(x, axis=0, weights=w, returned=True)
    assert_eq(got, want, rtol=1e-10)
    assert_eq(s, ws, rtol=1e-10)


def test_ptp_gradient_diff(rng):
    x = rng.standard_normal((8, 20))
    d = da.from_array(x, chunks=(4, 5))
    assert_eq(da.ptp(d, axis=1), np.ptp(x, axis=1))
    g = da.gradient(d, axis=1)
    assert_eq(g, np.gradient(x, axis=1), rtol=1e-10)
    g0, g1 = da.gradient(d)
    e0, e1 = np.gradient(x)
    assert_eq(g0, e0, rtol=1e-10)
    assert_eq(g1, e1, rtol=1e-10)
    assert_eq(da.diff(d, n=2, axis=1), np.diff(x, n=2, axis=1), rtol=1e-10)
    v = rng.standard_normal((15,))
    assert_eq(da.ediff1d(da.from_array(v, chunks=4)), np.ediff1d(v), rtol=1e-12)


def test_ravel_unravel_index(rng):
    idx = rng.integers(0, 6, (10,)), rng.integers(0, 7, (10,))
    got = da.ravel_multi_index(
        (da.from_array(idx[0], chunks=5), da.from_array(idx[1], chunks=5)), (6, 7)
    )
    assert_eq(got, np.ravel_multi_index(idx, (6, 7)), check_dtype=False)
    flat = rng.integers(0, 42, (10,))
    g0, g1 = da.unravel_index(da.from_array(flat, chunks=5), (6, 7))
    e0, e1 = np.unravel_index(flat, (6, 7))
    assert_eq(g0, e0, check_dtype=False)
    assert_eq(g1, e1, check_dtype=False)


def test_isin_union1d(rng):
    x = rng.integers(0, 20, (25,))
    test = [3, 5, 19]
    d = da.from_array(x, chunks=5)
    assert_eq(da.isin(d, test), np.isin(x, test))
    assert_eq(da.isin(d, test, invert=True), np.isin(x, test, invert=True))
    y = rng.integers(10, 30, (15,))
    assert_eq(
        da.union1d(d, da.from_array(y, chunks=5)), np.union1d(x, y)
    )


def test_round_allclose_isclose(rng):
    x = rng.standard_normal((12,)) * 5
    d = da.from_array(x, chunks=4)
    assert_eq(da.round(d, 2), np.round(x, 2))
    y = x + 1e-9
    dy = da.from_array(y, chunks=4)
    assert bool(da.allclose(d, dy).compute())
    assert_eq(da.isclose(d, dy), np.isclose(x, y))


def test_compress_extract(rng):
    x = rng.standard_normal((10, 4))
    cond = np.array([True, False, True, False, True, True, False, True, False, True])
    d = da.from_array(x, chunks=(5, 4))
    got = da.compress(cond, d, axis=0)
    assert_eq(got, np.compress(cond, x, axis=0))
    flat_cond = x > 0
    e = da.extract(da.from_array(flat_cond, chunks=(5, 4)), d)
    np.testing.assert_allclose(np.asarray(e.compute()), np.extract(flat_cond, x))


def test_outer(rng):
    a = rng.standard_normal((6,))
    b = rng.standard_normal((8,))
    assert_eq(
        da.outer(da.from_array(a, chunks=2), da.from_array(b, chunks=3)),
        np.outer(a, b),
        rtol=1e-12,
    )


def test_apply_along_axis(rng):
    x = rng.standard_normal((6, 10))
    d = da.from_array(x, chunks=(3, 10))
    got = da.apply_along_axis(np.sort, 1, d)
    assert_eq(got, np.apply_along_axis(np.sort, 1, x))


def test_apply_over_axes(rng):
    x = rng.standard_normal((4, 6, 8))
    d = da.from_array(x, chunks=2)
    got = da.apply_over_axes(np.sum, d, [0, 2])
    assert_eq(got, np.apply_over_axes(np.sum, x, [0, 2]))


def test_coarsen(rng):
    x = rng.standard_normal((12, 8))
    d = da.from_array(x, chunks=(4, 4))
    got = da.coarsen(np.sum, d, {0: 3, 1: 2})
    want = x.reshape(4, 3, 4, 2).sum(axis=(1, 3))
    assert_eq(got, want, rtol=1e-12)
    # trim_excess for non-divisible
    y = rng.standard_normal((13, 8))
    dy = da.from_array(y, chunks=(5, 4))
    got2 = da.coarsen(np.mean, dy, {0: 3}, trim_excess=True)
    want2 = y[:12].reshape(4, 3, 8).mean(axis=1)
    assert_eq(got2, want2, rtol=1e-12)


def test_select_piecewise(rng):
    x = rng.standard_normal((30,))
    d = da.from_array(x, chunks=6)
    conds = [d < -0.5, d > 0.5]
    choices = [d * 10, d * 100]
    got = da.select(conds, choices, default=-1.0)
    want = np.select([x < -0.5, x > 0.5], [x * 10, x * 100], default=-1.0)
    assert_eq(got, want)
    pw = da.piecewise(d, [d < 0, d >= 0], [-1.0, 1.0])
    assert_eq(pw, np.piecewise(x, [x < 0, x >= 0], [-1.0, 1.0]))


def test_tri_indices_functions():
    r, c = da.tril_indices(5)
    er, ec = np.tril_indices(5)
    assert_eq(r, er)
    assert_eq(c, ec)
    r2, c2 = da.triu_indices(4, k=1)
    er2, ec2 = np.triu_indices(4, k=1)
    assert_eq(r2, er2)
    assert_eq(c2, ec2)


def test_count_nonzero_argwhere_flatnonzero(rng):
    x = (rng.standard_normal((8, 6)) > 0.3).astype("f8") * rng.standard_normal((8, 6))
    d = da.from_array(x, chunks=(4, 3))
    assert_eq(da.count_nonzero(d), np.count_nonzero(x), check_dtype=False)
    assert_eq(da.count_nonzero(d, axis=0), np.count_nonzero(x, axis=0), check_dtype=False)
    np.testing.assert_array_equal(
        np.asarray(da.argwhere(d).compute()), np.argwhere(x)
    )
    np.testing.assert_array_equal(
        np.asarray(da.flatnonzero(d).compute()), np.flatnonzero(x)
    )


def test_nonzero_where_single_arg(rng):
    x = rng.standard_normal((6, 5))
    d = da.from_array(x, chunks=3)
    got = da.nonzero(d > 0)
    want = np.nonzero(x > 0)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g.compute()), w)


def test_topk_argtopk(rng):
    x = rng.standard_normal((40,))
    d = da.from_array(x, chunks=10)
    assert_eq(da.topk(d, 5), np.sort(x)[-5:][::-1])
    got_idx = np.asarray(da.argtopk(d, 5).compute())
    np.testing.assert_array_equal(x[got_idx], np.sort(x)[-5:][::-1])
    # negative k: smallest
    assert_eq(da.topk(d, -4), np.sort(x)[:4])


def test_squeeze_swapaxes_moveaxis_rollaxis(rng):
    x = rng.standard_normal((3, 1, 5, 1))
    d = da.from_array(x, chunks=2)
    assert_eq(da.squeeze(d), np.squeeze(x))
    assert_eq(da.squeeze(d, axis=1), np.squeeze(x, axis=1))
    y = rng.standard_normal((3, 4, 5))
    dy = da.from_array(y, chunks=2)
    assert_eq(da.swapaxes(dy, 0, 2), np.swapaxes(y, 0, 2))
    assert_eq(da.moveaxis(dy, 0, -1), np.moveaxis(y, 0, -1))
    assert_eq(da.rollaxis(dy, 2), np.rollaxis(y, 2))


def test_result_type_ndim_shape_helpers(rng):
    d = da.ones((4, 5), chunks=2, dtype="f4")
    assert da.result_type(d, np.float64) == np.float64
    assert da.ndim(d) == 2
    assert da.shape(d) == (4, 5)
