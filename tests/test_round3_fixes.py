"""Regression tests for round-3 ADVICE fixes.

Each test pins a specific advisor finding from ADVICE.md (round 2).
"""

import warnings

import numpy as np
import pytest

import dask_array_tpu as da


# -- ADVICE medium: Quantile 'nearest' NaN propagation ----------------------


@pytest.mark.parametrize("method", ["nearest", "linear", "lower", "higher"])
def test_quantile_nearest_propagates_nan(method):
    data = np.array([1.0, np.nan, 3.0, 2.0, 5.0])
    x = da.from_array(data, chunks=5)
    got = da.quantile(x, 0.5, method=method).compute()
    want = np.quantile(data, 0.5, method=method)
    np.testing.assert_array_equal(got, want)  # both nan
    assert np.isnan(got)


def test_quantile_nearest_nan_per_axis():
    data = np.array([[1.0, 2.0, 3.0], [1.0, np.nan, 3.0]])
    x = da.from_array(data, chunks=(2, 3))
    got = da.quantile(x, 0.5, axis=1, method="nearest").compute()
    want = np.quantile(data, 0.5, axis=1, method="nearest")
    np.testing.assert_array_equal(got, want)
    assert not np.isnan(got[0]) and np.isnan(got[1])


def test_nanquantile_nearest_still_skips_nan():
    data = np.array([1.0, np.nan, 3.0, 2.0, 5.0])
    x = da.from_array(data, chunks=5)
    got = da.nanquantile(x, 0.5, method="nearest").compute()
    want = np.nanquantile(data, 0.5, method="nearest")
    np.testing.assert_allclose(got, want)


def test_quantile_nearest_int_dtype_no_nan_path():
    data = np.arange(10)
    x = da.from_array(data, chunks=5)
    got = da.quantile(x, 0.3, method="nearest").compute()
    want = np.quantile(data, 0.3, method="nearest")
    np.testing.assert_allclose(got, want)


# -- ADVICE low: pickle registry identity check -----------------------------


def test_pickle_registry_identity_guard():
    from dask_array_tpu.utils._pickle import _registry, encode_operand

    reg = _registry()
    # registry entries hold strong refs: (obj, mod, attr) — ids stay valid
    for key, (obj, mod, attr) in list(reg.items())[:50]:
        assert id(obj) == key
    # a non-registered callable passes through untouched
    f = lambda x: x  # noqa: E731
    assert encode_operand(f) is f


# -- ADVICE low: planrec longdouble does not alias to float64 ---------------


def test_planrec_longdouble_no_alias():
    from dask_array_tpu._planrec import plan_records

    if np.longdouble is np.float64:
        pytest.skip("longdouble == float64 on this platform")
    a = np.longdouble(1) + np.finfo(np.longdouble).eps
    b = np.longdouble(1)
    if a == b:
        pytest.skip("longdouble has no extra precision on this platform")
    assert float(a) == float(b)  # they alias at f64
    x = da.ones((4,), chunks=4)
    from dask_array_tpu.ops.ufuncs import multiply

    r1 = plan_records(multiply(x, a).expr)
    r2 = plan_records(multiply(x, b).expr)
    if r1 is None or r2 is None:
        pytest.skip("planrec declined these plans")
    assert r1 != r2


# -- ADVICE low: deep-chain simplify converges without warning --------------


def test_deep_chain_simplify_no_spurious_warning():
    x = da.ones((8, 8), chunks=4)
    y = x
    for _ in range(250):
        y = y + 1
    z = y[:2, :2]
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = z.compute()
    np.testing.assert_allclose(out, np.full((2, 2), 251.0))


# -- ADVICE low: da.compute kwargs uniformly accepted -----------------------


def test_compute_kwargs_uniform():
    x = da.ones((4,), chunks=2)
    y = da.zeros((4,), chunks=2)
    (a,) = da.compute(x, scheduler="threads")
    a2, b2 = da.compute(x, y, scheduler="threads")
    np.testing.assert_allclose(a, a2)
    np.testing.assert_allclose(b2, np.zeros(4))


# -- one-pass shifted power-sum variance ------------------------------------


def test_var_onepass_shifted_data():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((100, 100)) * 1e-3 + 1e6
    d = da.from_array(x, chunks=32)
    assert abs(d.var().compute() - x.var()) / x.var() < 1e-10


def test_var_onepass_constant_exact_zero():
    c = da.ones((50, 50), chunks=16) * 3.7
    assert c.var().compute() == 0.0
    assert c.std().compute() == 0.0


def test_nanvar_onepass_nan_first_element():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((10,))
    w[0] = np.nan
    got = da.nanvar(da.from_array(w, chunks=4)).compute()
    np.testing.assert_allclose(got, np.nanvar(w), rtol=1e-12)


def test_nanvar_onepass_all_nan_slice():
    y = np.full((3, 4), np.nan)
    y[0] = [1.0, 2, 3, 4]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = da.nanvar(da.from_array(y, chunks=2), axis=1).compute()
        want = np.nanvar(y, axis=1)
    np.testing.assert_array_equal(got, want)


def test_var_onepass_never_negative():
    # rounding could push Q - T^2/n epsilon-negative; std must not be NaN
    x = np.full((64, 64), 7.1e7, dtype=np.float32)
    d = da.from_array(x, chunks=16)
    out = d.std().compute()
    assert out == 0.0 and not np.isnan(out)


# -- approximate (merge-based) percentile -----------------------------------


def test_percentile_internal_method_dask_single_chunk_exact():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(5000)
    d = da.from_array(x, chunks=len(x))
    got = da.percentile(d, [25, 75], internal_method="dask").compute()
    np.testing.assert_allclose(got, np.percentile(x, [25, 75]), rtol=1e-12)


def test_percentile_internal_method_dask_matches_reference_algorithm():
    # differential against an independent numpy replica of the reference's
    # merge_percentiles (reductions/_percentile.py:70-149): our traced
    # implementation must agree EXACTLY, including the algorithm's own
    # approximation bias
    rng = np.random.default_rng(4)
    x = rng.standard_normal(100_000)
    d = da.from_array(x, chunks=1000)
    qs = np.array([1, 10, 25, 50, 75, 90, 99], dtype="f8")
    got = da.percentile(d, qs, internal_method="dask").compute()

    calc_q = np.pad(qs, 1)
    calc_q[-1] = 100.0
    chunks = x.reshape(100, 1000)
    cv = np.concatenate([np.percentile(c, calc_q) for c in chunks])
    cnt = np.empty(len(calc_q))
    cnt[0] = calc_q[0]
    cnt[1:] = np.diff(calc_q)
    cc = np.concatenate([cnt * 1000] * 100)
    o = np.argsort(cv)
    want = np.interp(qs * x.size, np.cumsum(cc[o]), cv[o])
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # loose sanity vs the exact percentiles (inherent approximation bias)
    np.testing.assert_allclose(got, np.percentile(x, qs), atol=0.5)
    assert np.all(np.diff(got) >= 0)  # monotone in q


@pytest.mark.parametrize("m", ["lower", "higher", "midpoint", "nearest"])
def test_percentile_internal_method_dask_methods(m):
    rng = np.random.default_rng(5)
    x = rng.standard_normal(4000)
    d = da.from_array(x, chunks=500)
    got = da.percentile(d, [50], method=m, internal_method="dask").compute()
    assert np.isfinite(got).all()
    assert abs(got[0] - np.median(x)) < 0.2


def test_percentile_tdigest_alias_and_empty_chunks():
    rng = np.random.default_rng(6)
    x = rng.standard_normal(2000)
    d = da.from_array(x, chunks=400)
    t = da.percentile(d, 50, internal_method="tdigest").compute()
    assert abs(t[0] - np.median(x)) < 0.2
    dz = da.concatenate([da.from_array(np.array([], dtype="f8"), chunks=1), d])
    z = da.percentile(dz, [50], internal_method="dask").compute()
    np.testing.assert_allclose(z, t, rtol=1e-12)


def test_percentile_method_rename_warning():
    d = da.from_array(np.arange(10.0), chunks=5)
    with pytest.warns(FutureWarning, match="internal_method"):
        out = da.percentile(d, [50], method="dask")
    assert np.isfinite(out.compute()).all()
