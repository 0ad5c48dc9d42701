"""Routines edge cases ported from the reference's test_routines.py.

Case sources (reference tests/test_routines.py): choose:1836,
piecewise:1858/1870, compress:1746, extract:1781, unravel_index:2183,
ravel_multi_index:2243, union1d:1481, isin_assume_unique:1427,
einsum broadcasting:2693-2758, average:2768-2800, diff prepend/append:552/580,
insert/delete/append:2370-2486, tril non-square:2860, rot90:258,
apply_over_axes:515, ediff1d:614, outer:443, select broadcasting:1928,
count_nonzero axis:2071, searchsorted:727.
"""

from __future__ import annotations

import numpy as np
import pytest

import dask_array_tpu as da


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def eq(a, b, **kw):
    got = np.asarray(a.compute())
    want = np.asarray(b)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, **kw)


def test_choose(rng):
    idx = np.array([0, 1, 0, 1])
    eq(
        da.choose(da.from_array(idx, chunks=2), [da.ones(4, chunks=2), da.zeros(4, chunks=2)]),
        np.choose(idx, [np.ones(4), np.zeros(4)]),
    )


def test_piecewise(rng):
    x = rng.standard_normal((10, 12))
    d = da.from_array(x, chunks=(4, 5))
    eq(da.piecewise(d, [d < 0, d >= 0], [-1, 1]), np.piecewise(x, [x < 0, x >= 0], [-1, 1]))
    # otherwise-branch (len(funcs) == len(cond) + 1)
    eq(da.piecewise(d, [d < -1, d > 1], [-1, 1, 0]), np.piecewise(x, [x < -1, x > 1], [-1, 1, 0]))


def test_compress_extract(rng):
    x = rng.standard_normal((10, 12))
    d = da.from_array(x, chunks=(4, 5))
    cond = np.array([True, False] * 5)
    eq(da.compress(cond, d, axis=0), np.compress(cond, x, axis=0))
    got = np.asarray(da.extract(d > 0, d).compute())
    np.testing.assert_allclose(got, np.extract(x > 0, x))


def test_unravel_ravel_multi_index(rng):
    flat = np.array([3, 7, 11])
    got = da.unravel_index(da.from_array(flat, chunks=2), (10, 12))
    want = np.unravel_index(flat, (10, 12))
    for g, w in zip(got, want):
        eq(g, w)
    eq(
        da.ravel_multi_index(
            (da.from_array(np.array([1, 2]), chunks=1), da.from_array(np.array([3, 4]), chunks=1)),
            (10, 12),
        ),
        np.ravel_multi_index((np.array([1, 2]), np.array([3, 4])), (10, 12)),
    )


def test_union1d_isin(rng):
    a = np.array([1, 2, 3])
    b = np.array([2, 3, 4])
    eq(da.union1d(da.from_array(a, chunks=2), da.from_array(b, chunks=2)), np.union1d(a, b))
    x = rng.standard_normal((10, 12))
    d = da.from_array(x, chunks=(4, 5))
    eq(
        da.isin(d, [0.5, x[0, 0]], assume_unique=True),
        np.isin(x, [0.5, x[0, 0]], assume_unique=True),
    )


def test_einsum_broadcasting_contraction(rng):
    a = rng.standard_normal((2, 5, 12))
    b = rng.standard_normal((12, 3))
    eq(
        da.einsum("...ij,jk->...ik", da.from_array(a, chunks=(1, 2, 4)), da.from_array(b, chunks=(4, 3))),
        np.einsum("...ij,jk->...ik", a, b),
        rtol=1e-7,
    )


def test_average_weights_returned(rng):
    x = rng.standard_normal((10, 12))
    d = da.from_array(x, chunks=(4, 5))
    w = np.arange(1.0, 13.0)
    eq(da.average(d, axis=1, weights=w), np.average(x, axis=1, weights=w), rtol=1e-8)
    got_avg, got_w = da.average(d, axis=1, weights=w, returned=True)
    want_avg, want_w = np.average(x, axis=1, weights=w, returned=True)
    eq(got_avg, want_avg, rtol=1e-8)
    eq(got_w, want_w, rtol=1e-8)


def test_diff_prepend_append(rng):
    x = rng.standard_normal((10, 12))
    d = da.from_array(x, chunks=(4, 5))
    eq(da.diff(d, axis=1, prepend=0), np.diff(x, axis=1, prepend=0))
    ap = rng.standard_normal((10, 1))
    eq(da.diff(d, axis=1, append=da.from_array(ap)), np.diff(x, axis=1, append=ap))


def test_insert_delete_append(rng):
    x = rng.standard_normal((10, 12))
    d = da.from_array(x, chunks=(4, 5))
    eq(da.insert(d, [1, 4], 5.0, axis=1), np.insert(x, [1, 4], 5.0, axis=1))
    eq(da.delete(d, [1, 4], axis=1), np.delete(x, [1, 4], axis=1))
    ap = rng.standard_normal((10, 1))
    eq(da.append(d, da.from_array(ap), axis=1), np.append(x, ap, axis=1))


def test_tril_triu_nonsquare(rng):
    ns = rng.standard_normal((6, 9))
    d = da.from_array(ns, chunks=3)
    eq(da.tril(d), np.tril(ns))
    eq(da.triu(d, k=-1), np.triu(ns, k=-1))
    got = da.tril_indices(5, k=1)
    want = np.tril_indices(5, k=1)
    for g, w in zip(got, want):
        eq(g, w)


def test_rot90_apply_over_axes(rng):
    x = rng.standard_normal((10, 12))
    d = da.from_array(x, chunks=(4, 5))
    eq(da.rot90(d, k=3, axes=(1, 0)), np.rot90(x, k=3, axes=(1, 0)))
    eq(da.apply_over_axes(np.sum, d, [0, 1]), np.apply_over_axes(np.sum, x, [0, 1]), rtol=1e-8)


def test_ediff1d_outer(rng):
    x = rng.standard_normal((10, 12))
    d = da.from_array(x, chunks=(4, 5))
    eq(
        da.ediff1d(d, to_begin=-99, to_end=np.array([88, 99])),
        np.ediff1d(x, to_begin=-99, to_end=np.array([88, 99])),
        rtol=1e-8,
    )
    eq(da.outer(d.ravel()[:5], d.ravel()[:4]), np.outer(x.ravel()[:5], x.ravel()[:4]), rtol=1e-8)


def test_select_broadcasting(rng):
    x = rng.standard_normal((10, 12))
    conds = [np.array([True, False]), np.array([False, True])]
    eq(
        da.select(
            [da.from_array(c) for c in conds],
            [da.from_array(x[:2, :2]).T[0], 10.0],
            default=0,
        ),
        np.select(conds, [x[:2, :2].T[0], 10.0], default=0),
    )


def test_count_nonzero_searchsorted(rng):
    x = rng.standard_normal((10, 12))
    d = da.from_array(x, chunks=(4, 5))
    eq(da.count_nonzero(d > 0, axis=1), np.count_nonzero(x > 0, axis=1))
    srt = np.sort(x.ravel())
    eq(
        da.searchsorted(da.from_array(srt, chunks=30), da.from_array(np.array([0.0, 1.0]))),
        np.searchsorted(srt, np.array([0.0, 1.0])),
    )
