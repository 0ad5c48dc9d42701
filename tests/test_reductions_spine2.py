"""Reductions spine, second batch: the reference's core reduction grids
(``tests/test_reductions.py`` reduction_1d_test/reduction_2d_test) plus the
scenarios that had no counterpart here — datetime reductions, NaN-slice
grids, nanarg all-NaN/empty ValueError (host-fetch validation), unknown-
chunk arg reductions, the weighted generic-reduction protocol, nanquantile
dims, and the cumreduction axis/dtype/method grid.

Divergence noted inline: arg reductions over an unknown-chunk axis COMPUTE
here via the eager lane (the reference raises at graph construction).
"""

import warnings

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


def same_name(a, b):
    return a.expr._name == b.expr._name


def reduction_1d_test(da_func, darr, np_func, narr, use_dtype=True, split_every=True):
    assert_eq(da_func(darr), np_func(narr))
    assert_eq(da_func(narr), np_func(narr))  # numpy input accepted
    assert_eq(da_func(darr, keepdims=True), np_func(narr, keepdims=True))
    assert_eq(da_func(darr, axis=()), np_func(narr, axis=()))
    assert same_name(da_func(darr), da_func(darr))
    assert same_name(da_func(darr, keepdims=True), da_func(darr, keepdims=True))
    if use_dtype:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            assert_eq(da_func(darr, dtype="f8"), np_func(narr, dtype="f8"))
            assert_eq(da_func(darr, dtype="i8"), np_func(narr, dtype="i8"))
            assert same_name(da_func(darr, dtype="i8"), da_func(darr, dtype="i8"))
    if split_every:
        a1 = da_func(darr, split_every=2)
        a2 = da_func(darr, split_every={0: 2})
        assert same_name(a1, a2)
        assert_eq(a1, np_func(narr))
        assert_eq(a2, np_func(narr))
        assert_eq(da_func(darr, keepdims=True, split_every=2), np_func(narr, keepdims=True))


def reduction_2d_test(da_func, darr, np_func, narr, use_dtype=True, split_every=True):
    assert_eq(da_func(darr), np_func(narr))
    assert_eq(da_func(darr, keepdims=True), np_func(narr, keepdims=True))
    assert_eq(da_func(darr, axis=()), np_func(narr, axis=()))
    assert_eq(da_func(darr, axis=0), np_func(narr, axis=0))
    assert_eq(da_func(darr, axis=1), np_func(narr, axis=1))
    assert_eq(da_func(darr, axis=-1), np_func(narr, axis=-1))
    assert_eq(da_func(darr, axis=-2), np_func(narr, axis=-2))
    assert_eq(da_func(darr, axis=1, keepdims=True), np_func(narr, axis=1, keepdims=True))
    assert_eq(da_func(darr, axis=(), keepdims=True), np_func(narr, axis=(), keepdims=True))
    assert_eq(da_func(darr, axis=(1, 0)), np_func(narr, axis=(1, 0)))
    assert same_name(da_func(darr, axis=()), da_func(darr, axis=()))
    assert same_name(da_func(darr, axis=1), da_func(darr, axis=1))
    assert same_name(da_func(darr, axis=(1, 0)), da_func(darr, axis=(1, 0)))
    if use_dtype:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            assert_eq(da_func(darr, dtype="f8"), np_func(narr, dtype="f8"))
            assert_eq(da_func(darr, dtype="i8"), np_func(narr, dtype="i8"))
    if split_every:
        a1 = da_func(darr, split_every=4)
        a2 = da_func(darr, split_every={0: 2, 1: 2})
        assert same_name(a1, a2)
        assert_eq(a1, np_func(narr))
        assert_eq(a2, np_func(narr))
        assert_eq(da_func(darr, axis=0, split_every=2), np_func(narr, axis=0))
        assert_eq(
            da_func(darr, axis=0, keepdims=True, split_every=2),
            np_func(narr, axis=0, keepdims=True),
        )


_1D_PAIRS = [
    (da.sum, np.sum, True), (da.prod, np.prod, True), (da.mean, np.mean, True),
    (da.var, np.var, True), (da.std, np.std, True), (da.min, np.min, False),
    (da.max, np.max, False), (da.any, np.any, False), (da.all, np.all, False),
    (da.nansum, np.nansum, True), (da.nanprod, np.nanprod, True),
    (da.nanmean, np.mean, True), (da.nanvar, np.var, True),
    (da.nanstd, np.std, True), (da.nanmin, np.nanmin, False),
    (da.nanmax, np.nanmax, False),
]


@pytest.mark.parametrize("dtype", ["f4", "i4", "c8"])
def test_reductions_1D(dtype):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        x = (np.arange(5) + 1j * np.arange(5)).astype(dtype)
    a = da.from_array(x, chunks=(2,))
    for dfn, nfn, use_dtype in _1D_PAIRS:
        if dtype == "c8" and nfn in (np.nanmin, np.nanmax, np.min, np.max):
            continue  # complex ordering: numpy lexicographic, jax real-part
        reduction_1d_test(dfn, a, nfn, x, use_dtype and dtype != "c8")


@pytest.mark.parametrize("dtype", ["f4", "i4"])
def test_reductions_2D(dtype):
    x = (np.arange(20) % 7 + 1).astype(dtype).reshape(4, 5)
    a = da.from_array(x, chunks=(2, 2))
    for dfn, nfn, use_dtype in _1D_PAIRS:
        reduction_2d_test(dfn, a, nfn, x, use_dtype)


def test_reductions_0D():
    x = np.int_(4)
    a = da.from_array(x, chunks=-1)
    for dfn, nfn, _ in _1D_PAIRS[:9]:
        assert_eq(dfn(a), nfn(x))


def test_reductions_1D_datetime():
    x = np.arange(5).astype("datetime64[ns]")
    a = da.from_array(x, chunks=(2,))
    for dfn, nfn in [(da.min, np.min), (da.max, np.max)]:
        assert_eq(dfn(a), nfn(x))
        assert_eq(dfn(a, keepdims=True), nfn(x, keepdims=True))


def test_reductions_2D_datetime():
    x = np.arange(6).astype("datetime64[us]").reshape(2, 3)
    a = da.from_array(x, chunks=(1, 2))
    for dfn, nfn in [(da.min, np.min), (da.max, np.max)]:
        assert_eq(dfn(a), nfn(x))
        assert_eq(dfn(a, axis=0), nfn(x, axis=0))
        assert_eq(dfn(a, axis=1), nfn(x, axis=1))


def test_reductions_2D_nans():
    x = np.full((4, 4), np.nan)
    x[:2, :2] = np.array([[1, 2], [3, 4]])
    x[2, 2] = 5
    x[3, 3] = 6
    a = da.from_array(x, chunks=(2, 2))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        for dfn, nfn in [(da.nansum, np.nansum), (da.nanprod, np.nanprod),
                         (da.nanmean, np.nanmean), (da.nanvar, np.nanvar),
                         (da.nanstd, np.nanstd), (da.nanmin, np.nanmin),
                         (da.nanmax, np.nanmax)]:
            assert_eq(dfn(a), nfn(x))
            assert_eq(dfn(a, axis=0), nfn(x, axis=0))
            assert_eq(dfn(a, axis=1), nfn(x, axis=1))


@pytest.mark.parametrize(
    ["dfunc", "func"],
    [(da.nanmin, np.nanmin), (da.nanmax, np.nanmax), (da.nansum, np.nansum)],
)
def test_nan_reduction_warnings(dfunc, func):
    x = np.random.default_rng(0).random((10, 10, 10))
    x[5] = np.nan
    a = da.from_array(x, chunks=(3, 4, 5))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        expected = func(x, 1)
    assert_eq(dfunc(a, 1), expected)


@pytest.mark.parametrize(
    ["dfunc", "func"], [(da.nanargmin, np.nanargmin), (da.nanargmax, np.nanargmax)]
)
def test_nanarg_reductions(dfunc, func):
    x = np.random.default_rng(0).random((10, 10, 10))
    x[5] = np.nan
    a = da.from_array(x, chunks=(3, 4, 5))
    assert_eq(dfunc(a), func(x))
    assert_eq(dfunc(a, 0), func(x, 0))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        with pytest.raises(ValueError):
            dfunc(a, 1).compute()
        with pytest.raises(ValueError):
            dfunc(a, 2).compute()
        x[:] = np.nan
        a = da.from_array(x, chunks=(3, 4, 5))
        with pytest.raises(ValueError):
            dfunc(a).compute()


@pytest.mark.parametrize("func", ["argmax", "nanargmax"])
def test_arg_reductions_unknown_chunksize(func):
    # DIVERGENCE (stronger): the reference raises for an unknown-chunk
    # reduced axis; the eager lane computes it here
    x = da.ones((10, 10), chunks=(5, 5))
    x = x[x[0, :] > 0, :]
    np.testing.assert_array_equal(
        np.asarray(getattr(da, func)(x, axis=0).compute()), np.zeros(10, dtype=np.intp)
    )
    np.testing.assert_array_equal(
        np.asarray(getattr(da, func)(x, axis=1).compute()), np.zeros(10, dtype=np.intp)
    )


def test_weighted_reduction_protocol():
    def w_sum(x, weights=None, dtype=None, computing_meta=False, **kwargs):
        if computing_meta:
            return x
        if weights is not None:
            x = x * weights
        return np.sum(x, dtype=dtype, **kwargs)

    a = 1.0 + np.arange(60).reshape(6, 10)
    dx = da.from_array(a, chunks=(4, 5))
    w = np.linspace(1, 2, 6).reshape(6, 1)

    x = da.reduction(dx, w_sum, np.sum, dtype=dx.dtype)
    assert_eq(x, np.sum(a))
    x = da.reduction(dx, w_sum, np.sum, dtype="f8", weights=w)
    assert_eq(x, np.sum(a * w))
    with pytest.raises(ValueError):
        da.reduction(dx, w_sum, np.sum, dtype="f8", weights=np.ones(3))


def test_nanquantile_one_and_two_dims():
    arr = np.random.default_rng(1).standard_normal(10)
    darr = da.from_array(arr, chunks=(2,))
    assert_eq(da.nanquantile(darr, 0.75, axis=-1), np.nanquantile(arr, 0.75, axis=-1))
    arr = np.random.default_rng(1).standard_normal((10, 10))
    darr = da.from_array(arr, chunks=(2, -1))
    assert_eq(da.nanquantile(darr, 0.75, axis=-1), np.nanquantile(arr, 0.75, axis=-1))
    assert_eq(da.nanpercentile(darr, 0.75, axis=-1), np.nanpercentile(arr, 0.75, axis=-1))


@pytest.mark.parametrize("func", ["cumsum", "cumprod", "nancumsum", "nancumprod"])
@pytest.mark.parametrize("use_nan", [False, True])
@pytest.mark.parametrize("axis", [None, 0, 1, -1])
@pytest.mark.parametrize("method", ["sequential", "blelloch"])
def test_array_cumreduction_axis(func, use_nan, axis, method):
    np_func = getattr(np, func)
    da_func = getattr(da, func)
    s = (5, 6, 4)
    a = np.arange(np.prod(s), dtype=float).reshape(s)
    if use_nan:
        a[1] = np.nan
    d = da.from_array(a, chunks=(2, 3, 2))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        a_r = np_func(a, axis=axis)
    d_r = da_func(d, axis=axis, method=method)
    assert_eq(d_r, a_r)


@pytest.mark.parametrize("func", ["cumsum", "cumprod", "nancumsum", "nancumprod"])
@pytest.mark.parametrize("method", ["sequential", "blelloch"])
@pytest.mark.parametrize("target_dtype", [None, int, float])
def test_array_cumreduction_dtype(func, method, target_dtype):
    np_func = getattr(np, func)
    da_func = getattr(da, func)
    a = np.arange(12).reshape(3, 4)
    d = da.from_array(a, chunks=2)
    assert_eq(
        da_func(d, axis=1, dtype=target_dtype, method=method),
        np_func(a, axis=1, dtype=target_dtype),
    )


def test_reduction_intermediate_chunks():
    # the generic user-kernel reduction keeps the reference's explicit
    # chunk-phase + PartialReduce tree; its chunk step must be size-1 along
    # the reduced axis (typed reductions lower to one dense XLA reduce
    # instead — by design, see docs/inventory.md §2.4)
    x = da.ones((10, 12), chunks=(5, 4))
    result = da.reduction(x, np.sum, np.sum, axis=0, keepdims=True, dtype="f8")
    lowered = result.expr.lower_completely()
    chunk_steps = [
        e for e in lowered.walk()
        if getattr(e, "chunks", None) == ((1, 1), (4, 4, 4))
    ]
    assert chunk_steps, [getattr(e, "chunks", None) for e in lowered.walk()]
    assert_eq(result, np.ones((1, 12)) * 10)


def test_mean_func_does_not_warn():
    x = da.from_array(np.full((4, 4), np.nan), chunks=2)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        da.mean(x).compute()  # traced mean: no host RuntimeWarning leaks
