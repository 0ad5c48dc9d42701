"""Generic reduction framework: reference-protocol parity tests.

Covers the corners VERDICT round-1 flagged as stubs: generic
``arg_reduction`` (offset-carrying structured-array tree), ``reduction``
with ``weights=``, the ``concatenate=False`` dict chunk/combine/aggregate
protocol (the reference's ``mean_chunk``/``mean_combine``/``mean_agg``
shape, ``_common.py:270-366``), ``output_size``, and
``cumreduction(preop=...)`` (Blelloch, ``_cumulative.py:267``).
"""

from functools import partial

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


@pytest.fixture
def rng():
    return np.random.default_rng(7)


# ---------------------------------------------------------------------------
# generic arg_reduction: the reference's structured-array chunk/combine/agg
# (mirrors arg_chunk/arg_combine/arg_agg in reductions/_common.py:675-830)
# ---------------------------------------------------------------------------


def _arg_combine_impl(data, axis, argfunc, keepdims=False):
    if len(axis) == data.ndim or data.ndim == 1:
        axis = None
    else:
        axis = axis[0]
    vals = data["vals"]
    arg = data["arg"]
    if axis is None:
        local_args = argfunc(vals, axis=axis, keepdims=keepdims)
        vals = vals.ravel()[local_args]
        arg = arg.ravel()[local_args]
    else:
        local_args = argfunc(vals, axis=axis)
        inds = list(np.ogrid[tuple(map(slice, local_args.shape))])
        inds.insert(axis, local_args)
        vals = vals[tuple(inds)]
        arg = arg[tuple(inds)]
        if keepdims:
            vals = np.expand_dims(vals, axis)
            arg = np.expand_dims(arg, axis)
    return arg, vals


def ref_arg_chunk(func, argfunc, x, axis, offset_info):
    arg_axis = None if len(axis) == x.ndim or x.ndim == 1 else axis[0]
    vals = func(x, axis=arg_axis, keepdims=True)
    arg = argfunc(x, axis=arg_axis, keepdims=True)
    if x.ndim > 0:
        if arg_axis is None:
            offset, total_shape = offset_info
            ind = np.unravel_index(arg.ravel()[0], x.shape)
            total_ind = tuple(o + i for (o, i) in zip(offset, ind))
            arg = np.full_like(arg, np.ravel_multi_index(total_ind, total_shape))
        else:
            arg = arg + offset_info
    result = np.empty(vals.shape, dtype=[("vals", vals.dtype), ("arg", arg.dtype)])
    result["vals"] = vals
    result["arg"] = arg
    return result


def ref_arg_combine(argfunc, data, axis=None, **kwargs):
    arg, vals = _arg_combine_impl(data, axis, argfunc, keepdims=True)
    result = np.empty(vals.shape, dtype=[("vals", vals.dtype), ("arg", arg.dtype)])
    result["vals"] = vals
    result["arg"] = arg
    return result


def ref_arg_agg(argfunc, data, axis=None, keepdims=False, **kwargs):
    return _arg_combine_impl(data, axis, argfunc, keepdims=keepdims)[0]


@pytest.mark.parametrize("axis", [None, 0, 1])
@pytest.mark.parametrize("keepdims", [False, True])
def test_generic_arg_reduction_argmax(rng, axis, keepdims):
    x = rng.standard_normal((10, 12))
    d = da.from_array(x, chunks=(4, 5))
    out = da.arg_reduction(
        d,
        partial(ref_arg_chunk, np.max, np.argmax),
        partial(ref_arg_combine, np.argmax),
        partial(ref_arg_agg, np.argmax),
        axis=axis,
        keepdims=keepdims,
    )
    expected = np.argmax(x, axis=axis, keepdims=keepdims)
    assert_eq(out, expected)


def test_generic_arg_reduction_argmin_split_every(rng):
    x = rng.standard_normal((64,))
    d = da.from_array(x, chunks=4)
    out = da.arg_reduction(
        d,
        partial(ref_arg_chunk, np.min, np.argmin),
        partial(ref_arg_combine, np.argmin),
        partial(ref_arg_agg, np.argmin),
        axis=0,
        split_every=2,
    )
    assert_eq(out, np.argmin(x, axis=0))


def test_generic_arg_reduction_bad_axis(rng):
    d = da.from_array(rng.standard_normal((4, 4)), chunks=2)
    with pytest.raises(TypeError, match="axis"):
        da.arg_reduction(d, None, None, None, axis=(0, 1))


# ---------------------------------------------------------------------------
# reduction(): dict protocol (concatenate=False), weights, output_size
# ---------------------------------------------------------------------------


def _deepmap(fn, pairs):
    if isinstance(pairs, list):
        return [_deepmap(fn, p) for p in pairs]
    return fn(pairs)


def _cat2(arrays, axes):
    from dask_array_tpu.ops.reductions import _concatenate2

    return _concatenate2(arrays, axes=list(axes))


def dict_mean_chunk(x, axis=None, keepdims=True, dtype="f8", **kw):
    n = np.full_like(np.sum(x, axis=axis, keepdims=True, dtype=dtype), 1.0)
    n = n * np.prod([x.shape[a] for a in axis])
    return {"n": n, "total": np.sum(x, axis=axis, keepdims=True, dtype=dtype)}


def dict_mean_combine(pairs, axis=None, keepdims=True, dtype="f8", **kw):
    if not isinstance(pairs, list):
        pairs = [pairs]
    n = _cat2(_deepmap(lambda p: p["n"], pairs), sorted(axis)).sum(axis=axis, keepdims=True)
    total = _cat2(_deepmap(lambda p: p["total"], pairs), sorted(axis)).sum(axis=axis, keepdims=True)
    return {"n": n, "total": total}


def dict_mean_agg(pairs, axis=None, keepdims=False, dtype="f8", **kw):
    if not isinstance(pairs, list):
        pairs = [pairs]
    n = _cat2(_deepmap(lambda p: p["n"], pairs), sorted(axis)).sum(axis=axis, keepdims=keepdims)
    total = _cat2(_deepmap(lambda p: p["total"], pairs), sorted(axis)).sum(axis=axis, keepdims=keepdims)
    return total / n


@pytest.mark.parametrize("axis", [None, 0, 1])
def test_reduction_dict_protocol(rng, axis):
    x = rng.standard_normal((12, 10))
    d = da.from_array(x, chunks=(4, 5))
    out = da.reduction(
        d,
        dict_mean_chunk,
        dict_mean_agg,
        combine=dict_mean_combine,
        axis=axis,
        dtype="f8",
        concatenate=False,
        split_every=2,
    )
    assert_eq(out, np.mean(x, axis=axis))


def test_reduction_weights(rng):
    x = rng.standard_normal((8, 6))
    w = rng.uniform(0.5, 2.0, size=(6,))

    def wsum_chunk(block, weights=None, axis=None, keepdims=True, **kw):
        return np.sum(block * weights, axis=axis, keepdims=keepdims)

    d = da.from_array(x, chunks=(4, 3))
    out = da.reduction(
        d, wsum_chunk, np.sum, axis=None, dtype="f8", weights=w
    )
    assert_eq(out, np.sum(x * w))


def test_reduction_weights_bad_shape(rng):
    d = da.from_array(rng.standard_normal((8, 6)), chunks=4)
    with pytest.raises(ValueError, match="broadcastable"):
        da.reduction(
            d, lambda b, w, **kw: b, np.sum, dtype="f8",
            weights=np.ones((3, 2)),
        )


def test_reduction_requires_dtype(rng):
    d = da.from_array(rng.standard_normal((4,)), chunks=2)
    with pytest.raises(ValueError, match="dtype"):
        da.reduction(d, np.sum, np.sum)


def test_reduction_output_size(rng):
    x = rng.standard_normal((16,))
    d = da.from_array(x, chunks=4)

    def chunk_minmax(block, axis=None, keepdims=True, **kw):
        return np.stack([np.min(block), np.max(block)])

    def agg_minmax(window, axis=None, keepdims=False, **kw):
        w = window.reshape(-1, 2)
        return np.stack([np.min(w[:, 0]), np.max(w[:, 1])])

    out = da.reduction(
        d, chunk_minmax, agg_minmax, axis=0, dtype="f8",
        keepdims=True, output_size=2,
    )
    assert out.shape == (2,)
    assert_eq(out, np.stack([x.min(), x.max()]))


def test_reduction_split_every_multiaxis(rng):
    x = rng.standard_normal((16, 16))
    d = da.from_array(x, chunks=(2, 2))
    out = da.reduction(d, np.sum, np.sum, axis=(0, 1), dtype="f8", split_every=4)
    assert_eq(out, np.sum(x))


# ---------------------------------------------------------------------------
# cumreduction with preop (Blelloch) — reference _cumulative.py:267
# ---------------------------------------------------------------------------


def test_cumreduction_blelloch_preop(rng):
    x = rng.standard_normal((5, 24))
    d = da.from_array(x, chunks=(5, 6))

    def cummax_f(b, axis=None):
        return np.maximum.accumulate(b, axis=axis)

    out = da.cumreduction(
        cummax_f, np.maximum, -np.inf, d, axis=1,
        method="blelloch", preop=np.max,
    )
    assert_eq(out, np.maximum.accumulate(x, axis=1))


def test_cumreduction_blelloch_requires_preop(rng):
    d = da.from_array(rng.standard_normal((8,)), chunks=4)

    def f(b, axis=None):
        return np.maximum.accumulate(b, axis=axis)

    with pytest.raises(TypeError, match="preop"):
        da.cumreduction(f, np.maximum, -np.inf, d, axis=0, method="blelloch")


def test_cumreduction_bad_method(rng):
    d = da.from_array(rng.standard_normal((8,)), chunks=4)

    def f(b, axis=None):
        return np.maximum.accumulate(b, axis=axis)

    with pytest.raises(ValueError, match="method"):
        da.cumreduction(f, np.maximum, -np.inf, d, axis=0, method="bogus")


# ---------------------------------------------------------------------------
# typed arg reductions: keepdims shape parity (ADVICE round-1, item 2)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fn", ["argmin", "argmax", "nanargmin", "nanargmax"])
def test_typed_argreduction_keepdims_full(rng, fn):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    out = getattr(da, fn)(d, axis=None, keepdims=True)
    expected = getattr(np, fn)(x, axis=None, keepdims=True)
    assert out.shape == expected.shape == (1, 1)
    assert_eq(out, expected)


def test_tree_reduce_prechunked(rng):
    # _tree_reduce over pre-reduced partials (the arg-reduction entry path)
    x = rng.standard_normal((8, 8))
    d = da.from_array(x, chunks=(2, 8))
    partials = d.map_blocks(
        lambda b: np.sum(b, axis=0, keepdims=True), chunks=((1,) * 4, (8,))
    )
    out = da._tree_reduce(
        partials, np.sum, axis=(0,), keepdims=False, dtype="f8", split_every=2
    )
    assert_eq(out, x.sum(axis=0))
