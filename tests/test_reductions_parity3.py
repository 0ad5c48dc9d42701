"""Round-3 reductions parity battery, ported from the reference spine
(/root/reference/dask_array/tests/test_reductions.py): the numel grid, the
1-D/2-D typed-reduction harnesses (dtype/keepdims/split_every/same-name),
datetime and NaN matrices, object-dtype reductions (host lane), empty-chunk
min/max, unknown-chunk arg reductions, moment conditioning, out= contracts,
cumreduction with raw ufunc.accumulate, topk/argtopk grids, trace args,
median rechunk discipline, quantile/nanquantile method+axis grids, and the
construction-does-not-execute invariant."""

import itertools
import warnings
from contextlib import contextmanager

import numpy as np
import pytest

import dask_array_tpu as da
import dask_array_tpu.reductions as red
from dask_array_tpu import config
from dask_array_tpu._test_utils import assert_eq


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@contextmanager
def does_not_warn():
    yield


def same_name(a, b):
    assert a.expr._name == b.expr._name


# ---------------------------------------------------------------------------
# numel / nannumel (reference test_numel)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dtype", ["f4", "i4"])
@pytest.mark.parametrize("keepdims", [True, False])
@pytest.mark.parametrize("nan", [True, False])
def test_numel(dtype, keepdims, nan):
    x = np.ones((2, 3, 4))
    if nan:
        y = np.random.default_rng(11).uniform(-1, 1, size=(2, 3, 4))
        x[y < 0] = np.nan
        numel = red.nannumel

        def _sum(arr, **kwargs):
            n = np.sum(np.ma.masked_where(np.isnan(arr), arr), **kwargs)
            return n.filled(0) if isinstance(n, np.ma.MaskedArray) else n

    else:
        numel = red.numel
        _sum = np.sum

    assert_eq(
        numel(x, axis=(), keepdims=keepdims, dtype=dtype),
        _sum(x, axis=(), keepdims=keepdims, dtype=dtype),
    )
    assert_eq(
        numel(x, axis=0, keepdims=keepdims, dtype=dtype),
        _sum(x, axis=0, keepdims=keepdims, dtype=dtype),
    )
    for length in range(x.ndim):
        for sub in itertools.combinations(range(x.ndim), length):
            assert_eq(
                numel(x, axis=sub, keepdims=keepdims, dtype=dtype),
                _sum(x, axis=sub, keepdims=keepdims, dtype=dtype),
            )


# ---------------------------------------------------------------------------
# typed-reduction harnesses (reference reduction_1d_test / reduction_2d_test)
# ---------------------------------------------------------------------------


def reduction_1d_test(da_func, darr, np_func, narr, use_dtype=True, split_every=True):
    assert_eq(da_func(darr), np_func(narr))
    assert_eq(da_func(narr), np_func(narr))  # works on raw numpy input too
    assert_eq(da_func(darr, keepdims=True), np_func(narr, keepdims=True))
    assert_eq(da_func(darr, axis=()), np_func(narr, axis=()))
    same_name(da_func(darr), da_func(darr))
    same_name(da_func(darr, keepdims=True), da_func(darr, keepdims=True))
    if use_dtype:
        assert_eq(da_func(darr, dtype="f8"), np_func(narr, dtype="f8"))
        assert_eq(da_func(darr, dtype="i8"), np_func(narr, dtype="i8"))
        same_name(da_func(darr, dtype="i8"), da_func(darr, dtype="i8"))
    if split_every:
        a1 = da_func(darr, split_every=2)
        a2 = da_func(darr, split_every={0: 2})
        same_name(a1, a2)
        assert_eq(a1, np_func(narr))
        assert_eq(a2, np_func(narr))
        assert_eq(da_func(darr, keepdims=True, split_every=2), np_func(narr, keepdims=True))


_1D_FUNCS = [
    (da.sum, np.sum, True), (da.prod, np.prod, True), (da.mean, np.mean, True),
    (da.var, np.var, True), (da.std, np.std, True), (da.min, np.min, False),
    (da.max, np.max, False), (da.any, np.any, False), (da.all, np.all, False),
    (da.nansum, np.nansum, True), (da.nanprod, np.nanprod, True),
    (da.nanmean, np.mean, True), (da.nanvar, np.var, True), (da.nanstd, np.std, True),
    (da.nanmin, np.nanmin, False), (da.nanmax, np.nanmax, False),
]


@pytest.mark.parametrize("dtype", ["f4", "i4", "c8"])
def test_reductions_1d_harness(dtype):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        x = (np.arange(5) + 1j * np.arange(5)).astype(dtype)
    a = da.from_array(x, chunks=(2,))
    for da_f, np_f, use_dtype in _1D_FUNCS:
        if dtype == "c8" and np_f in (np.min, np.max, np.nanmin, np.nanmax):
            continue  # complex ordering: numpy lexicographic, jax unsupported
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            reduction_1d_test(da_f, a, np_f, x, use_dtype and dtype != "c8")


def test_reductions_1d_datetime():
    x = np.arange(5).astype("datetime64[ns]")
    a = da.from_array(x, chunks=(2,))
    for da_f, np_f in [(da.min, np.min), (da.max, np.max), (da.any, np.any),
                       (da.all, np.all), (da.nanmin, np.nanmin), (da.nanmax, np.nanmax)]:
        reduction_1d_test(da_f, a, np_f, x, False)


@pytest.mark.parametrize("x", [np.array([np.inf, np.nan, -np.inf, 2]), np.array([np.nan, np.nan, 3, 2])])
def test_reductions_1d_nans(x):
    a = da.from_array(x, chunks=(1,))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        # use_dtype=False: numpy's float->int elementwise cast of +/-inf is
        # undefined behavior (wraps); XLA clamps — no parity to pin there
        reduction_1d_test(da.nansum, a, np.nansum, x, False)
        reduction_1d_test(da.nanprod, a, np.nanprod, x, False)
        reduction_1d_test(da.nanmean, a, np.nanmean, x, False)
        reduction_1d_test(da.nanvar, a, np.nanvar, x, False)
        reduction_1d_test(da.nanstd, a, np.nanstd, x, False)
        reduction_1d_test(da.nanmin, a, np.nanmin, x, False)
        reduction_1d_test(da.nanmax, a, np.nanmax, x, False)


def reduction_2d_test(da_func, darr, np_func, narr, use_dtype=True, split_every=True, rtol=1e-6):
    def assert_eq(a, b, **kw):  # noqa: A001 — tolerance-curried shadow
        from dask_array_tpu._test_utils import assert_eq as _ae

        kw.setdefault("rtol", rtol)
        return _ae(a, b, **kw)

    assert_eq(da_func(darr), np_func(narr))
    assert_eq(da_func(darr, keepdims=True), np_func(narr, keepdims=True))
    assert_eq(da_func(darr, axis=()), np_func(narr, axis=()))
    assert_eq(da_func(darr, axis=0), np_func(narr, axis=0))
    assert_eq(da_func(darr, axis=1), np_func(narr, axis=1))
    assert_eq(da_func(darr, axis=-1), np_func(narr, axis=-1))
    assert_eq(da_func(darr, axis=1, keepdims=True), np_func(narr, axis=1, keepdims=True))
    assert_eq(da_func(darr, axis=(1, 0)), np_func(narr, axis=(1, 0)))
    same_name(da_func(darr, axis=1), da_func(darr, axis=1))
    same_name(da_func(darr, axis=(1, 0)), da_func(darr, axis=(1, 0)))
    if use_dtype:
        assert_eq(da_func(darr, dtype="f8"), np_func(narr, dtype="f8"))
        assert_eq(da_func(darr, dtype="i8"), np_func(narr, dtype="i8"))
    if split_every:
        a1 = da_func(darr, split_every=4)
        a2 = da_func(darr, split_every={0: 2, 1: 2})
        same_name(a1, a2)
        assert_eq(a1, np_func(narr))
        assert_eq(a2, np_func(narr))
        assert_eq(da_func(darr, axis=0, split_every=2), np_func(narr, axis=0))
        assert_eq(da_func(darr, axis=0, keepdims=True, split_every=2), np_func(narr, axis=0, keepdims=True))
        assert_eq(da_func(darr, axis=1, split_every=2), np_func(narr, axis=1))


@pytest.mark.parametrize("dtype", ["f4", "i4"])
def test_reductions_2d_harness(dtype):
    x = np.arange(1, 122).reshape((11, 11)).astype(dtype)
    a = da.from_array(x, chunks=(4, 4))
    for da_f, np_f, use_dtype in _1D_FUNCS:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            # f4 var/std: the one-pass shifted power-sum form (HBM-roofline
            # design, bench/README) carries ~4e-5 relative error in f32
            rtol = 1e-4 if dtype == "f4" else 1e-6
            reduction_2d_test(da_f, a, np_f, x, use_dtype, rtol=rtol)


def test_reductions_2d_nans_matrix():
    # chunks are a mix of some/all/no NaNs
    x = np.full((4, 4), np.nan)
    x[:2, :2] = np.array([[1, 2], [3, 4]])
    x[2, 2] = 5
    x[3, 3] = 6
    a = da.from_array(x, chunks=(2, 2))
    nan_pairs = [
        (da.sum, np.sum), (da.prod, np.prod), (da.mean, np.mean),
        (da.var, np.var), (da.std, np.std), (da.min, np.min), (da.max, np.max),
        (da.any, np.any), (da.all, np.all), (da.nansum, np.nansum),
        (da.nanprod, np.nanprod), (da.nanmean, np.nanmean), (da.nanvar, np.nanvar),
        (da.nanstd, np.nanstd), (da.nanmin, np.nanmin), (da.nanmax, np.nanmax),
    ]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        for da_f, np_f in nan_pairs:
            reduction_2d_test(da_f, a, np_f, x, False, False)
        for df, nf in [(da.argmax, np.argmax), (da.argmin, np.argmin),
                       (da.nanargmax, np.nanargmax), (da.nanargmin, np.nanargmin)]:
            assert_eq(df(a), nf(x))
            assert_eq(df(a, axis=0), nf(x, axis=0))
            assert_eq(df(a, axis=1), nf(x, axis=1))


def test_nan_reduction_with_all_nan_layer(rng):
    x = rng.random((10, 10, 10))
    x[5] = np.nan
    a = da.from_array(x, chunks=(3, 4, 5))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        assert_eq(da.nanmin(a, 1), np.nanmin(x, 1))
        assert_eq(da.nanmax(a, 1), np.nanmax(x, 1))
    assert_eq(da.nanargmin(a, 0), np.nanargmin(x, 0))
    assert_eq(da.nanargmax(a, 0), np.nanargmax(x, 0))


def test_min_max_empty_chunks():
    x1 = np.arange(10)
    a1 = da.from_array(x1, chunks=1)
    for dfunc, func in [(da.min, np.min), (da.max, np.max)]:
        assert_eq(dfunc(a1[a1 < 2]), func(x1[x1 < 2]))
        x2 = np.arange(10)
        a2 = da.from_array(x2, chunks=((5, 0, 5),))
        assert_eq(dfunc(a2), func(x2))
        x3 = np.array([[1, 1, 2, 3], [1, 1, 4, 0]])
        a3 = da.from_array(x3, chunks=1)
        assert_eq(dfunc(a3[a3 >= 2]), func(x3[x3 >= 2]))
        # all chunks empty mimics numpy's zero-size error at compute time
        a4 = da.arange(10)
        with pytest.raises(ValueError):
            dfunc(a4[a4 < 0]).compute()


@pytest.mark.parametrize("func", ["argmax", "nanargmax"])
def test_arg_reductions_unknown_chunksize_known_axis(func):
    """Reducing along a KNOWN axis with unknown chunks elsewhere computes
    (the reference raises for the unknown axis; this framework's dense lane
    computes the correct value for both — strictly wider support)."""
    x = da.ones((10, 10), chunks=(5, 5))
    x = x[x[0, :] > 0, :]
    assert np.asarray(getattr(da, func)(x, axis=1).compute()).tolist() == [0] * 10
    y = da.ones((10, 10), chunks=(10, 10))
    y = y[y[0, :] > 0, :]
    assert np.asarray(getattr(da, func)(y, axis=0).compute()).tolist() == [0] * 10
    assert np.asarray(getattr(da, func)(y, axis=1).compute()).tolist() == [0] * 10


def test_moment_poorly_conditioned_and_tree(rng):
    def moment(x, n, axis=None):
        return ((x - x.mean(axis=axis, keepdims=True)) ** n).sum(axis=axis) / np.ones_like(x).sum(axis=axis)

    x = np.array([1.0, 2.0, 3.0] * 10).reshape((3, 10)) + 1e8
    a = da.from_array(x, chunks=5)
    assert_eq(a.moment(2), moment(x, 2), rtol=1e-5)
    assert_eq(a.moment(3), moment(x, 3), rtol=1e-5, atol=1e-4)
    assert_eq(a.moment(4), moment(x, 4), rtol=1e-5)

    x = np.arange(1, 122).reshape((11, 11)).astype("f8")
    a = da.from_array(x, chunks=(4, 4))
    assert_eq(a.moment(4, axis=1), moment(x, 4, axis=1))
    assert_eq(a.moment(4, axis=(1, 0)), moment(x, 4, axis=(1, 0)))
    assert_eq(a.moment(order=4, split_every=4), moment(x, 4))
    assert_eq(a.moment(order=4, axis=0, split_every=4), moment(x, 4, axis=0))
    assert_eq(a.moment(order=4, axis=1, split_every=4), moment(x, 4, axis=1))


def test_nan_matrix():
    x = np.array([[1, np.nan, 3, 4], [5, 6, 7, np.nan], [9, 10, 11, 12]])
    d = da.from_array(x, chunks=(2, 2))
    assert_eq(np.nansum(x), da.nansum(d))
    assert_eq(np.nansum(x, axis=0), da.nansum(d, axis=0))
    assert_eq(np.nanmean(x, axis=1), da.nanmean(d, axis=1))
    assert_eq(np.nanmin(x, axis=1), da.nanmin(d, axis=1))
    assert_eq(np.nanmax(x, axis=(0, 1)), da.nanmax(d, axis=(0, 1)))
    assert_eq(np.nanvar(x), da.nanvar(d))
    assert_eq(np.nanstd(x, axis=0), da.nanstd(d, axis=0))
    assert_eq(np.nanargmin(x, axis=0), da.nanargmin(d, axis=0))
    assert_eq(np.nanargmax(x, axis=0), da.nanargmax(d, axis=0))
    assert_eq(np.nanprod(x), da.nanprod(d))


@pytest.mark.parametrize("func", ["nansum", "sum", "nanmin", "min", "nanmax", "max"])
def test_nan_object_host_lane(func):
    """Object-dtype reductions execute on the host lane (reference
    test_nan_object)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        x = np.array([[1, np.nan, 3, 4], [5, 6, 7, np.nan], [9, 10, 11, 12]]).astype(object)
        d = da.from_array(x, chunks=(2, 2))
        exp0 = getattr(np, func)(x, axis=0)
        got0 = np.asarray(getattr(da, func)(d, axis=0).compute())
        assert all((a == b) or (np.isnan(a) and np.isnan(b)) for a, b in zip(got0, exp0))
        exp1 = getattr(np, func)(x, axis=1)
        got1 = np.asarray(getattr(da, func)(d, axis=1).compute())
        assert all((a == b) or (np.isnan(a) and np.isnan(b)) for a, b in zip(got1, exp1))
        exp = getattr(np, func)(x)
        got = getattr(da, func)(d).compute()
        assert (got == exp) or (np.isnan(got) and np.isnan(exp))


@pytest.mark.parametrize("method", ["sum", "mean", "prod"])
def test_object_reduction(method):
    arr = da.ones(1).astype(object)
    result = getattr(arr, method)().compute()
    assert result == 1


def test_0d_array_scalar_types():
    x = da.mean(da.ones(4, chunks=4), axis=0).compute()
    y = np.mean(np.ones(4))
    assert type(x) == type(y)
    x = da.sum(da.zeros(4, chunks=1)).compute()
    y = np.sum(np.zeros(4))
    assert type(x) == type(y)


def test_reduction_on_scalar():
    x = da.from_array(np.array(1.0), chunks=())
    assert bool((x == x).all().compute())


def test_reductions_0d_input():
    x = np.int_(3)
    a = da.from_array(x, chunks=())
    for da_f, np_f, _ in _1D_FUNCS:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            actual = da_f(a)
            assert_eq(actual, np_f(x))
            assert actual.size == 1


# ---------------------------------------------------------------------------
# split_every config + names + out=
# ---------------------------------------------------------------------------


def _tree_depth(x):
    """Number of PartialReduce steps in the lowered plan."""
    from dask_array_tpu.ops.reductions import PartialReduce

    return builtins_len([e for e in x.expr.lower_completely().walk() if isinstance(e, PartialReduce)])


def builtins_len(it):
    return len(it)


def test_tree_reduce_set_options():
    """config split_every drives the generic-reduction tree depth (typed
    reductions compile to ONE dense XLA reduce here — no task tree to pin)."""
    x = da.from_array(np.arange(242).reshape((11, 22)), chunks=(1, 22))

    def generic_sum():
        return da.reduction(x, np.sum, np.sum, axis=(0, 1), dtype="i8")

    with config.set(split_every={0: 2, 1: 2}):
        assert_eq(generic_sum(), np.arange(242).sum())
        deep = _tree_depth(generic_sum())
    assert deep > _tree_depth(generic_sum())


def test_general_reduction_names():
    dtype = int
    a = da.reduction(da.ones(10, dtype, chunks=2), np.sum, np.sum, dtype=dtype, name="foo")
    assert a.expr._name.startswith("foo")
    assert_eq(a, np.int64(10))


def test_reduction_names_prefixes():
    x = da.ones(5, chunks=(2,))
    assert x.sum().expr._name.startswith("sum")
    assert "max" in x.max().expr._name.split("-")[0]
    assert x.all().expr._name.startswith("all")
    assert x.mean().expr._name.startswith("mean")
    assert da.nansum(x).expr._name.startswith("nansum")


@pytest.mark.parametrize("func", [np.sum, np.argmax])
def test_array_reduction_out(func):
    x = da.arange(10, chunks=(5,))
    y = da.ones((10, 10), chunks=(4, 4))
    func(y, axis=0, out=x)
    assert_eq(x, func(np.ones((10, 10)), axis=0), check_dtype=False)


def test_median_out_dask_array():
    x = da.ones(10, chunks=(5,))
    y = da.ones((10, 10), chunks=(4, 4))
    da.median(y, axis=0, out=x)
    assert_eq(x, np.median(np.ones((10, 10)), axis=0))


@pytest.mark.parametrize(
    "reduce",
    [
        lambda x, out: x.sum(axis=0, out=out),
        lambda x, out: da.median(x, axis=0, out=out),
        lambda x, out: da.cumsum(x, axis=0, out=out),
        lambda x, out: da.argmax(x, axis=0, out=out),
    ],
)
def test_reduction_out_numpy_array_raises(reduce):
    x = da.ones((10, 10), chunks=(4, 4))
    out = np.empty((10, 10))
    with pytest.raises(NotImplementedError, match="out parameter is not fully supported"):
        reduce(x, out)


# ---------------------------------------------------------------------------
# cumulative (reference cumreduction ufunc/out/empty-block cases)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ufunc", ["add", "multiply", "maximum"])
# target_dtype=int omitted: numpy's unsafe in-place int accumulation order is
# not reproducible in a traced program (its own docs call the cast undefined)
@pytest.mark.parametrize("target_dtype", [None, float])
def test_array_cumreduction_ufunc(ufunc, target_dtype):
    ufunc_obj = getattr(np, ufunc)
    a = np.linspace(0, 1, num=10, dtype=float)
    d = da.from_array(a, chunks=3)
    a_r = ufunc_obj.accumulate(a, dtype=target_dtype)
    d_r = da.cumreduction(ufunc_obj.accumulate, ufunc_obj, ufunc_obj.identity, d, dtype=target_dtype)
    assert_eq(a_r, d_r)


@pytest.mark.parametrize("func", [np.cumsum, np.cumprod])
def test_array_cumreduction_out(func):
    x = da.ones((10, 10), chunks=(4, 4))
    func(x, axis=0, out=x)
    assert_eq(x, func(np.ones((10, 10)), axis=0))


@pytest.mark.parametrize("method", ["sequential", "blelloch"])
@pytest.mark.parametrize("func", ["cumsum", "cumprod"])
def test_cumreduction_empty_blocks(func, method):
    """Scans over boolean-masked inputs with empty leading/middle/trailing
    blocks (reference test_cumreduction_empty_blocks)."""
    x = da.from_array(np.arange(1.0, 21.0), chunks=5)
    dfunc, nfunc = getattr(da, func), getattr(np, func)
    for mask in [x > 8, (x < 4) | (x > 13), x < 9, x == 14]:
        xn = x[mask]
        base = np.asarray(xn.compute())
        got = np.asarray(dfunc(xn, axis=0, method=method).compute())
        np.testing.assert_array_equal(got, nfunc(base))


def test_cumreduction_no_rechunk_on_1d_array():
    from dask_array_tpu._rechunk import Rechunk

    y = da.cumsum(da.ones((5,)))
    assert not [e for e in y.expr.lower_completely().walk() if isinstance(e, Rechunk)]


@pytest.mark.parametrize(
    "func",
    [da.cumsum, da.cumprod, da.argmin, da.argmax, da.min, da.max, da.nansum, da.nanmax],
)
@pytest.mark.parametrize("method", ["sequential", "blelloch"])
def test_regres_3940_name_distinctness(func, method):
    kwargs = {"method": method} if func in {da.cumsum, da.cumprod} else {}
    a = da.ones((5, 2), chunks=(2, 2))
    assert func(a, **kwargs).expr._name != func(a + 1, **kwargs).expr._name
    assert func(a, axis=0, **kwargs).expr._name != func(a, **kwargs).expr._name
    assert func(a, axis=0, **kwargs).expr._name != func(a, axis=1, **kwargs).expr._name


# ---------------------------------------------------------------------------
# topk / argtopk (reference test_topk_argtopk1/2/3)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("npfunc,daskfunc", [(np.sort, da.topk), (np.argsort, da.argtopk)])
@pytest.mark.parametrize("split_every", [None, 2, 4, 8])
def test_topk_argtopk1(rng, npfunc, daskfunc, split_every):
    k = 5
    npa = rng.random(800)
    npb = rng.random((10, 20, 30))
    a = da.from_array(npa, chunks=((120, 80, 100, 200, 300),))
    b = da.from_array(npb, chunks=(4, 8, 8))

    assert_eq(npfunc(npa)[-k:][::-1], daskfunc(a, k, split_every=split_every))
    assert_eq(npfunc(npa)[:k], daskfunc(a, -k, split_every=split_every))
    assert_eq(
        npfunc(npb, axis=0)[-k:, :, :][::-1, :, :],
        daskfunc(b, k, axis=0, split_every=split_every),
    )
    assert_eq(
        npfunc(npb, axis=1)[:, -k:, :][:, ::-1, :],
        daskfunc(b, k, axis=1, split_every=split_every),
    )
    assert_eq(
        npfunc(npb, axis=-1)[:, :, -k:][:, :, ::-1],
        daskfunc(b, k, axis=-1, split_every=split_every),
    )
    with pytest.raises(ValueError):
        daskfunc(b, k, axis=3, split_every=split_every)
    assert_eq(npfunc(npb, axis=0)[:k, :, :], daskfunc(b, -k, axis=0, split_every=split_every))
    assert_eq(npfunc(npb, axis=1)[:, :k, :], daskfunc(b, -k, axis=1, split_every=split_every))
    assert_eq(npfunc(npb, axis=-1)[:, :, :k], daskfunc(b, -k, axis=-1, split_every=split_every))


@pytest.mark.parametrize("npfunc,daskfunc", [(np.sort, da.topk), (np.argsort, da.argtopk)])
@pytest.mark.parametrize("split_every", [None, 2, 3, 4])
@pytest.mark.parametrize("chunksize", [1, 2, 3, 4, 5, 10])
def test_topk_argtopk2(rng, npfunc, daskfunc, split_every, chunksize):
    """k larger than the chunk size."""
    npa = rng.random((10,))
    a = da.from_array(npa, chunks=chunksize)
    k = 5
    assert_eq(npfunc(npa)[-k:][::-1], daskfunc(a, k, split_every=split_every))
    assert_eq(npfunc(npa)[:k], daskfunc(a, -k, split_every=split_every))


def test_topk_argtopk3():
    a = da.random.default_rng(5).random((10, 20, 30), chunks=(4, 8, 8))
    assert_eq(a.topk(5, axis=1, split_every=2), da.topk(a, 5, axis=1, split_every=2))
    assert_eq(a.argtopk(5, axis=1, split_every=2), da.argtopk(a, 5, axis=1, split_every=2))


# ---------------------------------------------------------------------------
# trace / median rechunk discipline / empty-chunk nan reducers
# ---------------------------------------------------------------------------


def test_trace_full_grid():
    def _assert(a, b, *args, **kwargs):
        return assert_eq(a.trace(*args, **kwargs), b.trace(*args, **kwargs))

    b = np.arange(12).reshape((3, 4))
    a = da.from_array(b, 1)
    _assert(a, b)
    _assert(a, b, 0)
    _assert(a, b, 1)
    _assert(a, b, -1)

    b = np.arange(8).reshape((2, 2, 2))
    a = da.from_array(b, 2)
    _assert(a, b)
    _assert(a, b, 0)
    _assert(a, b, 1)
    _assert(a, b, -1)
    _assert(a, b, 0, 0, 1)
    _assert(a, b, 0, 0, 2)
    _assert(a, b, 0, 1, 2, int)
    _assert(a, b, 0, 1, 2, float)
    _assert(a, b, offset=1, axis1=0, axis2=2, dtype=int)
    _assert(a, b, offset=1, axis1=0, axis2=2, dtype=float)


@pytest.mark.parametrize("func", ["median", "nanmedian"])
@pytest.mark.parametrize("axis", [0, [0, 2], 1])
def test_median_does_not_rechunk_if_whole_axis_in_one_chunk(axis, func):
    from dask_array_tpu._rechunk import Rechunk

    x = np.arange(100).reshape((2, 5, 10))
    d = da.from_array(x, chunks=(2, 1, 10))
    actual = getattr(da, func)(d, axis=axis)
    expected = getattr(np, func)(x, axis=axis)
    assert_eq(actual, expected)
    # the reference inserts a rechunk for axis=1 (whole axis must be one
    # chunk per task); the dense lane never needs one — pin that
    assert not [e for e in actual.expr.walk() if isinstance(e, Rechunk)]


@pytest.mark.parametrize("func", ["nanmin", "nanmax"])
def test_empty_chunk_nanmin_nanmax(func):
    x = np.arange(10).reshape(2, 5)
    d = da.from_array(x, chunks=2)
    x2 = x[x > 4]
    d2 = d[d > 4]
    # unknown chunks still compute here (dense lane; reference raises)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        assert float(np.asarray(getattr(da, func)(d2).compute())) == float(getattr(np, func)(x2))
    d3 = d2.compute_chunk_sizes()
    assert_eq(getattr(da, func)(d3), getattr(np, func)(x2))


@pytest.mark.parametrize("func", ["nanmin", "nanmax"])
def test_empty_chunk_nanmin_nanmax_raise(func):
    x = np.arange(10).reshape(2, 5)
    d = da.from_array(x, chunks=2)
    d = d[d > 9]
    x = x[x > 9]
    d = d.compute_chunk_sizes()
    with pytest.raises(ValueError):
        getattr(np, func)(x)
    with pytest.raises(ValueError):
        getattr(da, func)(d).compute()


@pytest.mark.parametrize("func", ["nanvar", "nanstd"])
def test_nan_func_does_not_warn(func):
    x = np.ones((10,)) * np.nan
    x[0] = 1
    x[1] = 2
    d = da.from_array(x, chunks=2)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        getattr(da, func)(d).compute()
    assert not [w for w in rec if issubclass(w.category, RuntimeWarning)]


# ---------------------------------------------------------------------------
# quantile / nanquantile grids (reference test_quantile family)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("axis", [3, 0, [1, 3]])
@pytest.mark.parametrize("q", [0.75, [0.75], [0.75, 0.4]])
@pytest.mark.parametrize("rechunk", [True, False])
def test_nanquantile_grid(rng, rechunk, q, axis):
    shape = 7, 10, 7, 10
    arr = rng.standard_normal(shape)
    indexer = rng.integers(0, 10, size=shape)
    arr[indexer >= 8] = np.nan
    arr[:, :, :, 1] = 1
    arr[1, :, :, :] = 1
    darr = da.from_array(arr, chunks=(2, 3, 4, (5 if rechunk else -1)))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        assert_eq(da.nanquantile(darr, q, axis=axis), np.nanquantile(arr, q, axis=axis))
        assert_eq(
            da.nanquantile(darr, q, axis=axis, keepdims=True),
            np.nanquantile(arr, q, axis=axis, keepdims=True),
        )
        qq = np.asarray(q) * 100
        assert_eq(da.nanpercentile(darr, qq, axis=axis), np.nanpercentile(arr, qq, axis=axis))
        assert_eq(
            da.nanpercentile(darr, qq, axis=axis, keepdims=True),
            np.nanpercentile(arr, qq, axis=axis, keepdims=True),
        )


@pytest.mark.parametrize("axis", [3, [1, 3]])
@pytest.mark.parametrize("q", [0.75, [0.75]])
@pytest.mark.parametrize("rechunk", [True, False])
def test_quantile_grid(rng, rechunk, q, axis):
    shape = 10, 15, 20, 15
    arr = rng.standard_normal(shape)
    indexer = rng.integers(0, 10, size=shape)
    arr[indexer >= 8] = np.nan
    darr = da.from_array(arr, chunks=(2, 3, 4, (5 if rechunk else -1)))
    assert_eq(da.quantile(darr, q, axis=axis), np.quantile(arr, q, axis=axis))
    assert_eq(
        da.quantile(darr, q, axis=axis, keepdims=True),
        np.quantile(arr, q, axis=axis, keepdims=True),
    )


@pytest.mark.parametrize("func_da,func_np", [
    (da.quantile, np.quantile), (da.nanquantile, np.nanquantile), (da.nanpercentile, np.nanpercentile)])
def test_quantile_func_family_with_axis_none(func_da, func_np):
    """axis=None over a multi-chunk array computes exactly here (the
    reference raises NotImplementedError — its per-chunk merge cannot run the
    full algorithm; the dense lane can)."""
    darr = da.ones((3, 3), chunks=(2, 2))
    assert float(np.asarray(func_da(darr, 0.5, axis=None).compute())) == 1.0
    darr = da.from_array(np.array([-1, 0, 1]))
    assert float(np.asarray(func_da(darr, 0.0, axis=None).compute())) == -1.0


def test_nanquantile_all_nan(rng):
    arr = np.full((4, 5, 6), np.nan)
    darr = da.from_array(arr, chunks=(2, 3, -1))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        got = np.asarray(da.nanquantile(darr, 0.75, axis=-1).compute())
        exp = np.nanquantile(arr, 0.75, axis=-1)
    assert np.isnan(got).all() and np.isnan(exp).all()


@pytest.mark.parametrize("method", [
    "weibull", "hazen", "interpolated_inverted_cdf", "median_unbiased",
    "normal_unbiased", "inverted_cdf", "averaged_inverted_cdf",
    "closest_observation", "midpoint", "nearest", "lower", "higher"])
def test_nanquantile_methods(rng, method):
    shape = 6, 8, 10
    arr = rng.standard_normal(shape)
    indexer = rng.integers(0, 10, size=shape)
    arr[indexer >= 8] = np.nan
    darr = da.from_array(arr, chunks=(2, 3, -1))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        assert_eq(
            da.nanquantile(darr, 0.75, axis=-1, method=method),
            np.nanquantile(arr, 0.75, axis=-1, method=method),
        )
        assert_eq(
            da.quantile(darr, 0.75, axis=-1, method=method),
            np.quantile(arr, 0.75, axis=-1, method=method),
        )


@pytest.mark.parametrize("method", ["lower", "higher", "nearest", "inverted_cdf", "closest_observation"])
def test_quantile_discrete_methods_preserve_int_dtype(rng, method):
    xi = rng.integers(0, 100, (17,))
    di = da.from_array(xi, chunks=5)
    for q in [0.0, 0.25, 0.3, 2 / 3, 1.0]:
        exp = np.quantile(xi, q, method=method)
        got = da.quantile(di, q, method=method)
        assert got.dtype == np.asarray(exp).dtype
        assert int(np.asarray(got.compute())) == int(exp)


def test_nanquantile_one_and_two_dims(rng):
    arr = rng.standard_normal(10)
    darr = da.from_array(arr, chunks=(2,))
    assert_eq(da.nanquantile(darr, 0.75, axis=-1), np.nanquantile(arr, 0.75, axis=-1))
    arr2 = rng.standard_normal((10, 10))
    darr2 = da.from_array(arr2, chunks=(2, -1))
    assert_eq(da.nanquantile(darr2, 0.75, axis=-1), np.nanquantile(arr2, 0.75, axis=-1))
    assert_eq(da.nanpercentile(darr2, 0.75, axis=-1), np.nanpercentile(arr2, 0.75, axis=-1))


# ---------------------------------------------------------------------------
# construction laziness (reference test_deep_reduction_stack_construction...)
# ---------------------------------------------------------------------------


def test_deep_reduction_stack_construction_does_not_execute(rng, monkeypatch):
    """Building a deep reduction stack with mismatched chunk boundaries must
    not execute anything (the reference pins no-lowering; execution is this
    framework's analogous boundary)."""
    import dask_array_tpu._executor as ex

    def boom(*a, **k):
        raise AssertionError("construction must not execute")

    monkeypatch.setattr(ex, "execute", boom)
    x = da.from_array(rng.random((2000, 8)), chunks=(500, 8))
    y = da.from_array(rng.random((2000, 8)), chunks=(700, 8))
    deep = x
    for _ in range(20):
        deep = (deep + y) * deep.mean(axis=1, keepdims=True) + deep * 0.001
    assert deep.shape == (2000, 8)
