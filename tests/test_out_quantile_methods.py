"""``out=`` parameter support and quantile interpolation methods.

Reference: ``tests/test_reductions.py::test_array_reduction_out``,
``::test_array_cumreduction_out``, ``::test_median_out_dask_array``,
``::test_reduction_out_numpy_array_raises``, ``::test_nanquantile_method``.
"""

from __future__ import annotations

import warnings

import numpy as np
import pytest

import dask_array_tpu as da


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def eq(a, b, **kw):
    got = np.asarray(a.compute())
    want = np.asarray(b)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, **kw)


def test_reduction_out(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    o = da.zeros(8, chunks=4)
    r = d.sum(axis=0, out=o)
    assert r is o
    eq(o, x.sum(axis=0), rtol=1e-8)
    o2 = da.zeros(6, chunks=3)
    d.mean(axis=1, out=o2)
    eq(o2, x.mean(axis=1), rtol=1e-8)
    o3 = da.zeros((), chunks=())
    d.max(out=o3)
    eq(o3, x.max())


def test_reduction_out_dtype_cast(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    o = da.zeros(8, chunks=4, dtype="int64")
    d.sum(axis=0, out=o)
    got = np.asarray(o.compute())
    assert got.dtype == np.dtype("int64")
    np.testing.assert_array_equal(got, x.sum(axis=0).astype("int64"))


def test_reduction_out_numpy_raises(rng):
    d = da.from_array(rng.standard_normal((6, 8)), chunks=(3, 4))
    with pytest.raises(NotImplementedError):
        d.sum(axis=0, out=np.zeros(8))


def test_reduction_out_shape_mismatch_raises(rng):
    d = da.from_array(rng.standard_normal((6, 8)), chunks=(3, 4))
    with pytest.raises(ValueError, match="[Mm]ismatched"):
        d.sum(axis=0, out=da.zeros(5, chunks=5))


def test_cumreduction_out(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    o = da.zeros((6, 8), chunks=(3, 4))
    d.cumsum(axis=1, out=o)
    eq(o, np.cumsum(x, axis=1), rtol=1e-8)
    o2 = da.zeros((6, 8), chunks=(3, 4))
    da.nancumprod(d, axis=0, out=o2)
    eq(o2, np.nancumprod(x, axis=0), rtol=1e-8)


def test_median_arg_var_out(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    o = da.zeros(8, chunks=4)
    da.median(d, axis=0, out=o)
    eq(o, np.median(x, axis=0), rtol=1e-8)
    o2 = da.zeros(8, chunks=4)
    da.argmin(d, axis=0, out=o2)
    eq(o2, np.argmin(x, axis=0))
    o3 = da.zeros(8, chunks=4)
    da.var(d, axis=0, out=o3)
    eq(o3, np.var(x, axis=0), rtol=1e-8)


@pytest.mark.parametrize("method", ["linear", "nearest", "lower", "higher", "midpoint"])
def test_quantile_methods(rng, method):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    eq(da.quantile(d, 0.3, axis=0, method=method), np.quantile(x, 0.3, axis=0, method=method))
    eq(
        da.quantile(d, [0.1, 0.5, 0.9], axis=1, method=method),
        np.quantile(x, [0.1, 0.5, 0.9], axis=1, method=method),
    )
    eq(da.quantile(d, 0.37, method=method), np.quantile(x, 0.37, method=method))


@pytest.mark.parametrize("method", ["linear", "nearest", "lower"])
def test_nanquantile_methods(rng, method):
    x = rng.standard_normal((6, 8))
    x[0, :4] = np.nan
    x[2, 1] = np.nan
    d = da.from_array(x, chunks=(3, 4))
    eq(
        da.nanquantile(d, 0.3, axis=0, method=method),
        np.nanquantile(x, 0.3, axis=0, method=method),
    )


def test_quantile_nearest_keepdims(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    eq(
        da.quantile(d, 0.3, axis=0, method="nearest", keepdims=True),
        np.quantile(x, 0.3, axis=0, method="nearest", keepdims=True),
    )


def test_percentile_methods(rng):
    # dask semantics: percentile always returns a 1-D result of len(q)
    x = rng.standard_normal(40)
    d = da.from_array(x, chunks=10)
    eq(da.percentile(d, 30, method="nearest"), np.percentile(x, [30], method="nearest"))
    eq(da.percentile(d, [10, 90], method="higher"), np.percentile(x, [10, 90], method="higher"))
    with pytest.warns(FutureWarning, match="interpolation"):
        eq(
            da.percentile(d, [50], interpolation="lower"),
            np.percentile(x, [50], method="lower"),
        )


def test_quantile_multiple_axes():
    # reference reductions/_common.py:977: tuple axes rechunk-and-reduce;
    # here the dense program reduces the flattened axis set directly
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 6, 5))
    xn = x.copy()
    xn[::3] = np.nan
    d = da.from_array(x, chunks=(3, 2, 5))
    dn = da.from_array(xn, chunks=(3, 2, 5))
    for axis in [(0, 2), (1, 2), (0, 1, 2)]:
        for q in [0.5, [0.25, 0.75]]:
            for kd in [False, True]:
                for meth in ["linear", "nearest"]:
                    r = da.quantile(d, q, axis=axis, method=meth, keepdims=kd)
                    e = np.quantile(x, q, axis=axis, method=meth, keepdims=kd)
                    got = np.asarray(r.compute())
                    assert got.shape == e.shape
                    np.testing.assert_allclose(got, e, rtol=1e-12)
                    with warnings.catch_warnings():
                        warnings.simplefilter("ignore", RuntimeWarning)
                        rn = da.nanquantile(dn, q, axis=axis, method=meth, keepdims=kd)
                        en = np.nanquantile(xn, q, axis=axis, method=meth, keepdims=kd)
                    np.testing.assert_allclose(
                        np.asarray(rn.compute()), en, rtol=1e-12, equal_nan=True
                    )


def test_quantile_interpolation_rename_warns():
    d = da.from_array(np.arange(10.0), chunks=5)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        da.quantile(d, 0.5, axis=0, interpolation="linear")
    assert any("renamed" in str(r.message) for r in rec)
