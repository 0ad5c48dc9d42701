"""Reference test_reductions.py case ports (61 tests' behaviors).

Full-surface execution of typed reductions: 0-D/1-D/2-D x dtypes x nan
variants, negative axes, empty arrays, scalar reductions, cumulative
matrices, arg reductions with nan/unknown-chunk behaviors, and
chunk-structure independence.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu import config
from dask_array_tpu._test_utils import assert_eq

_REDUCERS = ["sum", "prod", "mean", "min", "max", "any", "all", "std", "var"]
_NAN_REDUCERS = [
    "nansum", "nanprod", "nanmean", "nanmin", "nanmax", "nanstd", "nanvar",
]


@pytest.fixture
def rng():
    return np.random.default_rng(103)


@pytest.mark.parametrize("name", _REDUCERS)
@pytest.mark.parametrize("dtype", ["f4", "f8", "i8"])
def test_reductions_1d(rng, name, dtype):
    x = (rng.standard_normal((37,)) * 4).astype(dtype)
    d = da.from_array(x, chunks=8)
    got = getattr(da, name)(d)
    want = getattr(np, name)(x)
    assert_eq(got, want, rtol=1e-6, check_dtype=(dtype != "i8" or name not in ("std", "var", "mean")))


@pytest.mark.parametrize("name", _REDUCERS)
@pytest.mark.parametrize("axis", [0, 1, (0, 1), None, -1])
@pytest.mark.parametrize("keepdims", [False, True])
def test_reductions_2d_grid(rng, name, axis, keepdims):
    x = rng.standard_normal((9, 12))
    d = da.from_array(x, chunks=(4, 5))
    got = getattr(da, name)(d, axis=axis, keepdims=keepdims)
    want = getattr(np, name)(x, axis=axis, keepdims=keepdims)
    assert_eq(got, want, rtol=1e-10)


@pytest.mark.parametrize("name", _NAN_REDUCERS)
def test_nan_reductions(rng, name):
    x = rng.standard_normal((8, 10))
    x[1, 2] = x[5, 5] = x[7, 0] = np.nan
    d = da.from_array(x, chunks=(3, 4))
    for axis in (None, 0, 1):
        got = getattr(da, name)(d, axis=axis)
        want = getattr(np, name)(x, axis=axis)
        assert_eq(got, want, rtol=1e-10)


def test_reductions_0d():
    d = da.from_array(np.float64(4.0), chunks=())
    assert_eq(d.sum(), np.float64(4.0))
    assert_eq(d.max(), np.float64(4.0))
    assert float(d.mean().compute()) == 4.0


def test_reduction_on_scalar_result(rng):
    x = rng.standard_normal((6, 6))
    d = da.from_array(x, chunks=2)
    s = d.sum()
    assert s.shape == ()
    assert_eq(s.sum(), x.sum())  # reducing a scalar again is identity


def test_reductions_with_empty_array():
    d = da.from_array(np.ones((0, 4)), chunks=2)
    assert_eq(d.sum(), np.float64(0.0))
    assert_eq(d.sum(axis=0), np.zeros(4))
    assert d.mean(axis=1).shape == (0,)


def test_reductions_with_negative_axes(rng):
    x = rng.standard_normal((4, 5, 6))
    d = da.from_array(x, chunks=2)
    assert_eq(d.sum(axis=-1), x.sum(axis=-1))
    assert_eq(d.sum(axis=(-1, -3)), x.sum(axis=(-1, -3)))
    assert_eq(d.mean(axis=-2, keepdims=True), x.mean(axis=-2, keepdims=True))


def test_reduction_errors(rng):
    d = da.from_array(rng.standard_normal((4, 4)), chunks=2)
    with pytest.raises(Exception):
        d.sum(axis=2)
    with pytest.raises(Exception):
        d.sum(axis=-3)


def test_moment(rng):
    x = rng.standard_normal((50,))
    d = da.from_array(x, chunks=10)
    for order in (2, 3, 4):
        got = da.moment(d, order)
        want = ((x - x.mean()) ** order).mean()
        assert_eq(got, want, rtol=1e-8)
    # ddof
    got = da.moment(d, 2, ddof=1)
    assert_eq(got, x.var(ddof=1), rtol=1e-8)


def test_var_std_ddof(rng):
    x = rng.standard_normal((7, 9))
    d = da.from_array(x, chunks=3)
    for ddof in (0, 1, 2):
        assert_eq(d.var(ddof=ddof), x.var(ddof=ddof), rtol=1e-10)
        assert_eq(d.std(ddof=ddof, axis=0), x.std(ddof=ddof, axis=0), rtol=1e-10)


@pytest.mark.parametrize("name", ["argmin", "argmax", "nanargmin", "nanargmax"])
def test_arg_reductions_match(rng, name):
    x = rng.standard_normal((7, 11))
    if name.startswith("nan"):
        x[2, 3] = np.nan
    d = da.from_array(x, chunks=(3, 4))
    for axis in (None, 0, 1):
        assert_eq(getattr(da, name)(d, axis=axis), getattr(np, name)(x, axis=axis))


def test_nanarg_all_nan_slice_raises_at_fetch():
    # numpy/dask RAISE "All-NaN slice encountered"; a traced XLA program
    # cannot raise on data values, so the -1 sentinel jax produces is
    # validated at the HOST FETCH of a direct compute (numpy parity for the
    # user-visible call; in-graph consumers see the sentinel)
    x = np.full((4,), np.nan)
    d = da.from_array(x, chunks=2)
    with pytest.raises(ValueError, match="All-NaN"):
        da.nanargmax(d).compute()
    with pytest.raises(ValueError, match="All-NaN"):
        da.nanargmin(d).compute()
    if config.get("tpu.jit", True):
        # trace lane: downstream consumption keeps the sentinel — a traced
        # program cannot raise data-dependently (docs/divergences.md #1)
        assert int((da.nanargmax(d) + 0).compute()) == -1
    else:
        # eager lane is numpy-strict: raises even for in-graph consumers
        with pytest.raises(ValueError, match="All-NaN"):
            (da.nanargmax(d) + 0).compute()


def test_arg_reductions_unknown_chunksize_raise(rng):
    x = rng.standard_normal((20,))
    d = da.from_array(x, chunks=5)
    m = d[da.from_array(x > 0, chunks=5)]
    with pytest.raises(ValueError, match="unknown chunksize"):
        da.arg_reduction(m, None, None, None, axis=0)


def test_tree_reduce_depth_values(rng):
    # deep split_every trees stay exact
    x = rng.standard_normal((128,))
    d = da.from_array(x, chunks=1)
    for se in (2, 4, 16):
        out = da.reduction(d, np.sum, np.sum, axis=0, dtype="f8", split_every=se)
        assert_eq(out, x.sum(), rtol=1e-12)


def test_reduction_names_deterministic(rng):
    x = rng.standard_normal((8,))
    a = da.from_array(x, chunks=4).sum()
    b = da.from_array(x, chunks=4).sum()
    assert a.expr._name == b.expr._name
    assert a.expr._name.startswith("sum")


@pytest.mark.parametrize("func", ["cumsum", "cumprod"])
@pytest.mark.parametrize("use_nan", [False, True])
@pytest.mark.parametrize("axis", [None, 0, 1])
@pytest.mark.parametrize("method", ["sequential", "blelloch"])
def test_cumreduction_matrix(rng, func, use_nan, axis, method):
    x = rng.standard_normal((6, 8)) * 0.5
    name = func
    if use_nan:
        x[1, 2] = np.nan
        name = "nan" + func
    d = da.from_array(x, chunks=(3, 4))
    got = getattr(da, name)(d, axis=axis, method=method)
    want = getattr(np, name)(x, axis=axis)
    assert_eq(got, want, rtol=1e-9)


@pytest.mark.parametrize("target_dtype", ["f8", "i8"])
def test_cumreduction_dtype(rng, target_dtype):
    x = rng.integers(0, 5, (12,))
    d = da.from_array(x, chunks=4)
    got = da.cumsum(d, dtype=target_dtype)
    assert got.dtype == np.dtype(target_dtype)
    assert_eq(got, np.cumsum(x, dtype=target_dtype))


@pytest.mark.parametrize("split_every", [None, 2, 4])
def test_topk_argtopk_split_every(rng, split_every):
    x = rng.standard_normal((100,))
    d = da.from_array(x, chunks=10)
    assert_eq(da.topk(d, 7, split_every=split_every), np.sort(x)[-7:][::-1])
    idx = np.asarray(da.argtopk(d, 7, split_every=split_every).compute())
    np.testing.assert_array_equal(x[idx], np.sort(x)[-7:][::-1])


def test_topk_axis_and_multi_dim(rng):
    x = rng.standard_normal((6, 20))
    d = da.from_array(x, chunks=(3, 5))
    got = np.asarray(da.topk(d, 3, axis=1).compute())
    want = -np.sort(-x, axis=1)[:, :3]
    np.testing.assert_allclose(got, want)


def test_trace_offsets(rng):
    x = rng.standard_normal((7, 9))
    d = da.from_array(x, chunks=3)
    for off in (-2, 0, 3):
        assert_eq(da.trace(d, offset=off), np.trace(x, offset=off), rtol=1e-12)


@pytest.mark.parametrize("axis", [None, 0, 1])
@pytest.mark.parametrize("keepdims", [False, True])
def test_median_grid(rng, axis, keepdims):
    x = rng.standard_normal((9, 11))
    d = da.from_array(x, chunks=4)
    assert_eq(da.median(d, axis=axis, keepdims=keepdims), np.median(x, axis=axis, keepdims=keepdims))


def test_quantile_multi_q(rng):
    x = rng.standard_normal((60,))
    d = da.from_array(x, chunks=15)
    q = [0.1, 0.5, 0.9]
    assert_eq(da.quantile(d, q, axis=0), np.quantile(x, q, axis=0), rtol=1e-12)
    assert_eq(da.percentile(d, [10, 50, 90]), np.percentile(x, [10, 50, 90]), rtol=1e-12)


def test_chunk_structure_independence(rng):
    # the same reduction over different chunkings gives identical values
    x = rng.standard_normal((24, 24))
    outs = []
    for chunks in [(24, 24), (6, 6), (24, 1), (5, 7)]:
        d = da.from_array(x, chunks=chunks)
        outs.append(np.asarray(d.sum(axis=0).compute()))
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], rtol=1e-12)


def test_nan_object_style_funcs(rng):
    # min/max/sum/prod via np functions on the collection (NEP-18)
    x = rng.standard_normal((6, 6))
    d = da.from_array(x, chunks=3)
    assert_eq(np.sum(d), x.sum())
    assert_eq(np.min(d, axis=0), x.min(axis=0))
    assert_eq(np.nanmax(d), np.nanmax(x))


def test_empty_chunk_nan_reducers():
    x = np.array([[1.0, np.nan], [2.0, 3.0]])
    d = da.from_array(x, chunks=1)
    assert_eq(da.nanmin(d), np.nanmin(x))
    assert_eq(da.nanmax(d, axis=1), np.nanmax(x, axis=1))
