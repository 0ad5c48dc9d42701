"""Reductions: typed dense reductions + the generic tree-reduce framework.

Parity: ``/root/reference/dask_array/reductions/`` (``reduction()``,
``Reduction``/``PartialReduce``, typed subclasses, arg-reductions,
cumulative scans, median/quantile) — fresh implementation.

TPU-first: a *typed* reduction (sum/mean/max/...) lowers to ONE dense XLA
reduce — inside a jitted program XLA already emits the optimal multi-pass
reduction (and, over a sharded axis, a psum tree on ICI), so the
reference's ``split_every`` PartialReduce cascade would only hide
information from the compiler.  ``split_every`` is still accepted (tree
shape is an execution detail here).  The generic ``reduction()`` API with
arbitrary user chunk/combine/aggregate functions keeps the explicit
per-block tree (``PartialReduce``), because user functions must see real
blocks.
"""

from __future__ import annotations

import builtins
import functools
import math
from numbers import Integral

import numpy as np

from dask_array_tpu import config
from dask_array_tpu._blockwise import Blockwise, elemwise
from dask_array_tpu._chunks import validate_axis
from dask_array_tpu._executor import BlockView, iter_block_indices
from dask_array_tpu._expr import ArrayExpr
from dask_array_tpu._slicing import is_basic_index


def _jnp():
    import jax.numpy as jnp

    return jnp


# ---------------------------------------------------------------------------
# typed dense reductions
# ---------------------------------------------------------------------------

# name -> (jnp function name, numpy function for meta, takes dtype kw)
_DENSE_KERNELS = {
    "sum": ("sum", np.sum, True),
    "prod": ("prod", np.prod, True),
    "min": ("min", np.min, False),
    "max": ("max", np.max, False),
    "any": ("any", np.any, False),
    "all": ("all", np.all, False),
    "mean": ("mean", np.mean, True),
    "nansum": ("nansum", np.nansum, True),
    "nanprod": ("nanprod", np.nanprod, True),
    "nanmin": ("nanmin", np.nanmin, False),
    "nanmax": ("nanmax", np.nanmax, False),
    "nanmean": ("nanmean", np.nanmean, True),
    "median": ("median", np.median, False),
    "nanmedian": ("nanmedian", np.nanmedian, False),
}


class Reduction(ArrayExpr):
    """A typed whole-axis reduction, executed as one dense XLA reduce."""

    _parameters = ("array", "kind", "axes", "keepdims", "_dtype", "split_every", "extra")
    _defaults = {"split_every": None, "extra": ()}

    def _name_prefix(self):
        return self.kind

    @functools.cached_property
    def chunks(self):
        out = []
        for ax, c in enumerate(self.array.chunks):
            if ax in self.axes:
                if self.keepdims:
                    out.append((1,))
            else:
                out.append(c)
        return tuple(out)

    @functools.cached_property
    def _meta(self):
        dtype = self.operand("_dtype")
        nd = len(self.chunks)
        if dtype is not None:
            return np.empty((0,) * nd, dtype=np.dtype(dtype))
        _, np_fn, _ = _DENSE_KERNELS[self.kind]
        probe = np.empty((1,) * self.array.ndim, dtype=self.array.dtype)
        with np.errstate(all="ignore"):
            out = np_fn(probe, axis=self.axes, keepdims=self.keepdims)
        return np.empty((0,) * nd, dtype=out.dtype)

    def _build(self, ctx):
        jnp = _jnp()
        jnp_name, _, takes_dtype = _DENSE_KERNELS[self.kind]
        fn = getattr(jnp, jnp_name)
        x = ctx.build(self.array).dense()
        kwargs = {"axis": self.axes, "keepdims": self.keepdims}
        if takes_dtype:
            kwargs["dtype"] = self.dtype
        extra = dict(self.extra or ())
        kwargs.update(extra)
        dense = fn(x, **kwargs)
        if dense.dtype != self.dtype:
            dense = dense.astype(self.dtype)
        return BlockView(self.chunks, dense=dense)

    def _accept_slice(self, index):
        if not is_basic_index(index):
            return None
        from dask_array_tpu._slicing import Slice

        # ints on kept axes become size-1 slices pushed inside, with an
        # outer [0] extraction (parity: _accept_slice_impl, _reduction.py:809)
        inner = []
        outer = []  # index applied AFTER the (pushed) reduction
        out_pos = 0
        any_push = False
        for ax in range(self.array.ndim):
            if ax in self.axes:
                if self.keepdims:
                    ind = index[out_pos]
                    if ind not in (slice(None), slice(0, 1, 1)):
                        return None
                    outer.append(slice(None))
                    out_pos += 1
                inner.append(slice(None))
            else:
                ind = index[out_pos]
                out_pos += 1
                dim = self.array.shape[ax]
                if isinstance(ind, Integral):
                    if not (isinstance(dim, float) and math.isnan(dim)) and dim <= 1:
                        # nothing left to shrink: keep the int outside
                        # (re-pushing would wrap a new layer every pass)
                        inner.append(slice(None))
                        outer.append(int(ind))
                    else:
                        inner.append(slice(int(ind), int(ind) + 1, 1))
                        outer.append(0)
                        any_push = True
                else:
                    from dask_array_tpu._slicing import normalize_slice

                    norm = normalize_slice(ind, dim) if not (isinstance(dim, float) and math.isnan(dim)) else ind
                    inner.append(norm)
                    outer.append(slice(None))
                    if norm != slice(None):
                        any_push = True
        if not any_push:
            return None
        pushed = type(self)(Slice(self.array, tuple(inner)), *self.operands[1:])
        if builtins.any(isinstance(o, Integral) for o in outer):
            return Slice(pushed, tuple(outer))
        return pushed


def _reduce(x, kind, axis=None, dtype=None, keepdims=False, split_every=None, extra=()):
    from dask_array_tpu._collection import Array, new_collection

    expr = x.expr if isinstance(x, Array) else x
    if axis is None:
        axes = tuple(range(expr.ndim))
    elif isinstance(axis, (tuple, list)):
        axes = tuple(sorted(validate_axis(a, expr.ndim) for a in axis))
    else:
        axes = (validate_axis(axis, expr.ndim),)
    if dtype is not None:
        dtype = np.dtype(dtype)
    return new_collection(
        Reduction(expr, kind, axes, bool(keepdims), dtype, split_every, extra)
    )


def sum(a, axis=None, dtype=None, keepdims=False, split_every=None, out=None):
    return _reduce(a, "sum", axis, dtype, keepdims, split_every)


def prod(a, axis=None, dtype=None, keepdims=False, split_every=None, out=None):
    return _reduce(a, "prod", axis, dtype, keepdims, split_every)


def min(a, axis=None, keepdims=False, split_every=None, out=None):
    return _reduce(a, "min", axis, None, keepdims, split_every)


def max(a, axis=None, keepdims=False, split_every=None, out=None):
    return _reduce(a, "max", axis, None, keepdims, split_every)


def any(a, axis=None, keepdims=False, split_every=None, out=None):
    return _reduce(a, "any", axis, None, keepdims, split_every)


def all(a, axis=None, keepdims=False, split_every=None, out=None):
    return _reduce(a, "all", axis, None, keepdims, split_every)


def mean(a, axis=None, dtype=None, keepdims=False, split_every=None, out=None):
    return _reduce(a, "mean", axis, dtype, keepdims, split_every)


def nansum(a, axis=None, dtype=None, keepdims=False, split_every=None, out=None):
    return _reduce(a, "nansum", axis, dtype, keepdims, split_every)


def nanprod(a, axis=None, dtype=None, keepdims=False, split_every=None, out=None):
    return _reduce(a, "nanprod", axis, dtype, keepdims, split_every)


def nanmin(a, axis=None, keepdims=False, split_every=None, out=None):
    return _reduce(a, "nanmin", axis, None, keepdims, split_every)


def nanmax(a, axis=None, keepdims=False, split_every=None, out=None):
    return _reduce(a, "nanmax", axis, None, keepdims, split_every)


def nanmean(a, axis=None, dtype=None, keepdims=False, split_every=None, out=None):
    return _reduce(a, "nanmean", axis, dtype, keepdims, split_every)


def median(a, axis=None, keepdims=False, out=None):
    return _reduce(a, "median", axis, None, keepdims, None)


def nanmedian(a, axis=None, keepdims=False, out=None):
    return _reduce(a, "nanmedian", axis, None, keepdims, None)


# -- variance family ----------------------------------------------------------


def _var_dtype(a, dtype):
    if dtype is not None:
        return np.dtype(dtype)
    dt = a.dtype
    if np.issubdtype(dt, np.integer) or dt == bool:
        return np.dtype(float)
    return dt


def moment(a, order, axis=None, dtype=None, keepdims=False, ddof=0, split_every=None, out=None):
    """Central moment of the given order (power-sums formulation)."""
    if order < 0:
        raise ValueError("Order must be non-negative")
    dt = _var_dtype(a, dtype)
    if order == 0:
        from dask_array_tpu.ops.creation import ones

        axes = _axes_of(a, axis)
        if keepdims:
            shape = tuple(1 if i in axes else s for i, s in enumerate(a.shape))
        else:
            shape = tuple(s for i, s in enumerate(a.shape) if i not in axes)
        return ones(shape, dtype=dt)
    n = _count(a, axis, keepdims=True, split_every=split_every)
    mu = sum(a.astype(dt), axis=axis, keepdims=True, split_every=split_every) / n
    centered = (a.astype(dt) - mu) ** order
    m = sum(centered, axis=axis, dtype=dt, keepdims=keepdims, split_every=split_every)
    denom = _count(a, axis, keepdims=keepdims, split_every=split_every) - ddof
    return m / denom


def _axes_of(a, axis):
    if axis is None:
        return tuple(range(a.ndim))
    if isinstance(axis, (tuple, list)):
        return tuple(validate_axis(x, a.ndim) for x in axis)
    return (validate_axis(axis, a.ndim),)


def _count(a, axis, keepdims, split_every, dtype="f8"):
    from dask_array_tpu.ops.creation import ones

    o = ones(a.shape, dtype=dtype, chunks=a.chunks)
    return sum(o, axis=axis, dtype=dtype, keepdims=keepdims, split_every=split_every)


def _nancount(a, axis, keepdims, split_every, dtype="f8"):
    import jax.numpy as jnp

    notnan = elemwise(jnp.logical_not, elemwise(jnp.isnan, a))
    return sum(notnan, axis=axis, dtype=dtype, keepdims=keepdims, split_every=split_every)


def var(a, axis=None, dtype=None, keepdims=False, ddof=0, split_every=None, out=None):
    dt = _var_dtype(a, dtype)
    x = a.astype(dt)
    n = _count(a, axis, keepdims=True, split_every=split_every, dtype=dt)
    mu = sum(x, axis=axis, dtype=dt, keepdims=True, split_every=split_every) / n
    m2 = sum((x - mu) * (x - mu), axis=axis, dtype=dt, keepdims=keepdims, split_every=split_every)
    denom = _count(a, axis, keepdims=keepdims, split_every=split_every, dtype=dt) - ddof
    return m2 / denom


def std(a, axis=None, dtype=None, keepdims=False, ddof=0, split_every=None, out=None):
    import jax.numpy as jnp

    return elemwise(jnp.sqrt, var(a, axis=axis, dtype=dtype, keepdims=keepdims, ddof=ddof, split_every=split_every))


def nanvar(a, axis=None, dtype=None, keepdims=False, ddof=0, split_every=None, out=None):
    import jax.numpy as jnp

    dt = _var_dtype(a, dtype)
    x = a.astype(dt)
    n = _nancount(a, axis, keepdims=True, split_every=split_every, dtype=dt)
    total = nansum(x, axis=axis, dtype=dt, keepdims=True, split_every=split_every)
    mu = total / n
    filled = elemwise(jnp.where, elemwise(jnp.isnan, x), mu, x)
    m2 = sum((filled - mu) * (filled - mu), axis=axis, dtype=dt, keepdims=keepdims, split_every=split_every)
    denom = _nancount(a, axis, keepdims=keepdims, split_every=split_every, dtype=dt) - ddof
    return m2 / denom


def nanstd(a, axis=None, dtype=None, keepdims=False, ddof=0, split_every=None, out=None):
    import jax.numpy as jnp

    return elemwise(jnp.sqrt, nanvar(a, axis=axis, dtype=dtype, keepdims=keepdims, ddof=ddof, split_every=split_every))


# -- arg reductions --------------------------------------------------------------


class ArgReduction(ArrayExpr):
    _parameters = ("array", "kind", "axis", "keepdims")

    _DENSE = {"argmin": "argmin", "argmax": "argmax", "nanargmin": "nanargmin", "nanargmax": "nanargmax"}

    def _name_prefix(self):
        return self.kind

    @functools.cached_property
    def chunks(self):
        if self.axis is None:
            return ((1,),) if self.keepdims else ()
        out = []
        for ax, c in enumerate(self.array.chunks):
            if ax == self.axis:
                if self.keepdims:
                    out.append((1,))
            else:
                out.append(c)
        return tuple(out)

    @functools.cached_property
    def _meta(self):
        return np.empty((0,) * len(self.chunks), dtype=np.intp)

    def _build(self, ctx):
        jnp = _jnp()
        x = ctx.build(self.array).dense()
        fn = getattr(jnp, self._DENSE[self.kind])
        if self.axis is None:
            dense = fn(x)
            if self.keepdims:
                dense = dense.reshape((1,))
        else:
            dense = fn(x, axis=self.axis, keepdims=self.keepdims)
        return BlockView(self.chunks, dense=dense.astype(np.intp))


def _argreduce(a, kind, axis=None, keepdims=False, split_every=None, out=None):
    from dask_array_tpu._collection import Array, new_collection

    expr = a.expr if isinstance(a, Array) else a
    if axis is not None:
        if not isinstance(axis, Integral):
            raise TypeError(f"axis must be an integer or None, got {axis!r}")
        axis = validate_axis(axis, expr.ndim)
    return new_collection(ArgReduction(expr, kind, axis, bool(keepdims)))


def argmin(a, axis=None, keepdims=False, split_every=None, out=None):
    return _argreduce(a, "argmin", axis, keepdims, split_every)


def argmax(a, axis=None, keepdims=False, split_every=None, out=None):
    return _argreduce(a, "argmax", axis, keepdims, split_every)


def nanargmin(a, axis=None, keepdims=False, split_every=None, out=None):
    return _argreduce(a, "nanargmin", axis, keepdims, split_every)


def nanargmax(a, axis=None, keepdims=False, split_every=None, out=None):
    return _argreduce(a, "nanargmax", axis, keepdims, split_every)


def arg_reduction(x, chunk, combine, agg, axis=None, keepdims=False, split_every=None, out=None):
    """Generic arg-reduction entry (parity hook; dense execution)."""
    raise NotImplementedError(
        "custom arg_reduction kernels are not supported yet; use argmin/argmax"
    )


# -- cumulative -----------------------------------------------------------------


class CumReduction(ArrayExpr):
    """Cumulative scan along one axis (dense: one XLA associative scan).

    The reference implements both a sequential carry chain and a Blelloch
    work-efficient scan over blocks (``_cumulative.py``); inside one XLA
    program ``jnp.cumsum``/``cumprod`` already lower to an optimal parallel
    scan, so ``method`` only survives as an API knob.
    """

    _parameters = ("array", "kind", "axis", "_dtype", "method")
    _defaults = {"method": "sequential"}

    def _name_prefix(self):
        return self.kind

    @property
    def chunks(self):
        return self.array.chunks

    @functools.cached_property
    def _meta(self):
        dtype = self.operand("_dtype")
        if dtype is not None:
            return np.empty((0,) * self.array.ndim, dtype=np.dtype(dtype))
        np_fn = getattr(np, self.kind)
        probe = np.empty((1,) * self.array.ndim, dtype=self.array.dtype)
        out = np_fn(probe, axis=self.axis)
        return np.empty((0,) * self.array.ndim, dtype=out.dtype)

    def _build(self, ctx):
        jnp = _jnp()
        x = ctx.build(self.array).dense()
        fn = getattr(jnp, self.kind)
        dense = fn(x, axis=self.axis, dtype=self.dtype)
        return BlockView(self.chunks, dense=dense)


def _cum(a, kind, axis=None, dtype=None, method="sequential", out=None):
    from dask_array_tpu._collection import Array, new_collection

    expr = a.expr if isinstance(a, Array) else a
    if axis is None:
        if expr.ndim > 1:
            from dask_array_tpu.ops._reshape import ravel

            expr = ravel(new_collection(expr)).expr
        axis = 0
    axis = validate_axis(axis, expr.ndim)
    if dtype is not None:
        dtype = np.dtype(dtype)
    return new_collection(CumReduction(expr, kind, axis, dtype, method))


def cumsum(a, axis=None, dtype=None, method="sequential", out=None):
    return _cum(a, "cumsum", axis, dtype, method)


def cumprod(a, axis=None, dtype=None, method="sequential", out=None):
    return _cum(a, "cumprod", axis, dtype, method)


def nancumsum(a, axis=None, dtype=None, method="sequential", out=None):
    return _cum(a, "nancumsum", axis, dtype, method)


def nancumprod(a, axis=None, dtype=None, method="sequential", out=None):
    return _cum(a, "nancumprod", axis, dtype, method)


def cumreduction(func, binop, ident, x, axis=None, dtype=None, out=None, method="sequential", preop=None):
    """Generic cumulative reduction over blocks (sequential carry chain)."""
    import jax.numpy as jnp

    name = getattr(func, "__name__", "")
    if func in (np.cumsum, jnp.cumsum) or name == "cumsum":
        return cumsum(x, axis=axis, dtype=dtype, method=method)
    if func in (np.cumprod, jnp.cumprod) or name == "cumprod":
        return cumprod(x, axis=axis, dtype=dtype, method=method)
    if preop is not None:
        raise NotImplementedError(
            "cumreduction(preop=...) (the Blelloch-method hook) is not "
            "supported; the generic scan uses a sequential carry chain"
        )
    if axis is None:
        x = x.ravel() if x.ndim != 1 else x
        axis = 0
    axis = validate_axis(axis, x.ndim)
    from dask_array_tpu._collection import new_collection

    return new_collection(_GenericCumLowered(x.expr, func, binop, ident, axis, np.dtype(dtype) if dtype else None))


class _GenericCumLowered(ArrayExpr):
    _parameters = ("array", "func", "binop", "ident", "axis", "_dtype")

    @property
    def chunks(self):
        return self.array.chunks

    @functools.cached_property
    def _meta(self):
        dtype = self.operand("_dtype")
        if dtype is not None:
            return np.empty((0,) * self.array.ndim, dtype=dtype)
        probe = np.empty((1,) * self.array.ndim, dtype=self.array.dtype)
        out = self.func(probe, axis=self.axis)
        return np.empty((0,) * self.array.ndim, dtype=out.dtype)

    def _build(self, ctx):
        view = ctx.build(self.array)
        axis = self.axis
        blocks = {}
        carry = {}
        nb = view.numblocks
        for idx in iter_block_indices(nb):
            b = view.block(idx)
            scanned = self.func(b, axis=axis)
            if self.dtype is not None and scanned.dtype != self.dtype:
                scanned = scanned.astype(self.dtype)
            key_prev = idx[:axis] + (idx[axis] - 1,) + idx[axis + 1:]
            if idx[axis] > 0:
                c = carry[key_prev]
                scanned = self.binop(c, scanned)
            # carry: last slice along axis
            last = [slice(None)] * len(nb)
            last[axis] = slice(-1, None)
            carry[idx] = scanned[tuple(last)]
            blocks[idx] = scanned
        return BlockView(self.chunks, blocks=blocks)


# -- quantiles --------------------------------------------------------------------


class Quantile(ArrayExpr):
    _parameters = ("array", "q", "axis", "method", "kind", "keepdims")

    def _name_prefix(self):
        return self.kind

    @functools.cached_property
    def _q_arr(self):
        return np.atleast_1d(np.asarray(self.q, dtype="f8"))

    @functools.cached_property
    def _scalar_q(self):
        return np.ndim(self.q) == 0

    @functools.cached_property
    def chunks(self):
        base = []
        for ax, c in enumerate(self.array.chunks):
            if self.axis is None or ax == self.axis:
                if self.keepdims:
                    base.append((1,))
                continue
            base.append(c)
        if self.axis is not None:
            pass
        lead = () if self._scalar_q else ((len(self._q_arr),),)
        return lead + tuple(base)

    @functools.cached_property
    def _meta(self):
        dt = np.promote_types(self.array.dtype, np.float64) if np.issubdtype(self.array.dtype, np.integer) else self.array.dtype
        if self.array.dtype == bool:
            dt = np.dtype("f8")
        return np.empty((0,) * len(self.chunks), dtype=dt)

    def _build(self, ctx):
        jnp = _jnp()
        x = ctx.build(self.array).dense()
        fn = jnp.nanquantile if self.kind.startswith("nan") else jnp.quantile
        q = jnp.asarray(self.q)
        dense = fn(x, q, axis=self.axis, method=self.method, keepdims=self.keepdims)
        return BlockView(self.chunks, dense=dense.astype(self.dtype))


def quantile(a, q, axis=None, method="linear", keepdims=False, **kwargs):
    from dask_array_tpu._collection import Array, new_collection

    expr = a.expr if isinstance(a, Array) else a
    if axis is not None:
        axis = validate_axis(axis, expr.ndim)
        if isinstance(axis, tuple):
            raise NotImplementedError("quantile over multiple axes is not supported")
    return new_collection(Quantile(expr, q if np.ndim(q) == 0 else tuple(np.asarray(q).tolist()), axis, method, "quantile", bool(keepdims)))


def nanquantile(a, q, axis=None, method="linear", keepdims=False, **kwargs):
    from dask_array_tpu._collection import Array, new_collection

    expr = a.expr if isinstance(a, Array) else a
    if axis is not None:
        axis = validate_axis(axis, expr.ndim)
    return new_collection(Quantile(expr, q if np.ndim(q) == 0 else tuple(np.asarray(q).tolist()), axis, method, "nanquantile", bool(keepdims)))


def percentile(a, q, method="linear", internal_method=None, **kwargs):
    """Approximate percentiles of a 1-D array (dask signature)."""
    if a.ndim != 1:
        raise NotImplementedError("Percentiles only implemented for 1-d arrays")
    q01 = np.true_divide(q, 100)
    out = quantile(a, tuple(np.atleast_1d(q01).tolist()), axis=0)
    return out


def nanpercentile(a, q, method="linear", **kwargs):
    if a.ndim != 1:
        raise NotImplementedError("Percentiles only implemented for 1-d arrays")
    q01 = np.true_divide(q, 100)
    return nanquantile(a, tuple(np.atleast_1d(q01).tolist()), axis=0)


# -- generic reduction framework ------------------------------------------------------


class PartialReduce(ArrayExpr):
    """One tree step: combine windows of ``split_every`` blocks per axis.

    Parity: ``PartialReduce`` (``reductions/_reduction.py:900``).
    """

    _parameters = ("array", "func", "axes", "split_every", "keepdims", "_dtype", "kwargs")
    _defaults = {"kwargs": ()}

    @functools.cached_property
    def chunks(self):
        out = []
        for ax, c in enumerate(self.array.chunks):
            if ax in self.axes:
                n_out = builtins.max(1, -(-len(c) // self.split_every))
                if self.keepdims:
                    out.append((1,) * n_out)
                elif n_out > 1 or self.keepdims:
                    out.append((1,) * n_out)
                # axis dropped when final and not keepdims handled by caller
            else:
                out.append(c)
        return tuple(out)

    @functools.cached_property
    def _meta(self):
        dtype = self.operand("_dtype")
        if dtype is not None:
            return np.empty((0,) * len(self.chunks), dtype=np.dtype(dtype))
        return np.empty((0,) * len(self.chunks), dtype=self.array.dtype)

    def _build(self, ctx):
        jnp = _jnp()
        view = ctx.build(self.array)
        nb_in = view.numblocks
        kwargs = dict(self.kwargs or ())
        blocks = {}
        for out_idx in iter_block_indices(self.numblocks):
            # window of input blocks feeding this output block
            ranges = []
            in_ax = 0
            for ax in range(len(nb_in)):
                if ax in self.axes:
                    o = out_idx[ax] if self.keepdims or True else 0
                    o = out_idx[ax]
                    lo = o * self.split_every
                    hi = builtins.min(lo + self.split_every, nb_in[ax])
                    ranges.append(range(lo, hi))
                else:
                    ranges.append(range(out_idx[ax], out_idx[ax] + 1))
            import itertools

            def rec(ax, prefix):
                if ax == len(ranges):
                    return view.block(prefix)
                parts = [rec(ax + 1, prefix + (i,)) for i in ranges[ax]]
                if len(parts) == 1:
                    return parts[0]
                return jnp.concatenate(parts, axis=ax)

            window = rec(0, ())
            res = self.func(window, axis=self.axes, keepdims=True, **kwargs)
            blocks[tuple(out_idx)] = res
        return BlockView(self.chunks, blocks=blocks)


class FinalReduce(ArrayExpr):
    """Final aggregate over all remaining blocks along the reduced axes."""

    _parameters = ("array", "func", "axes", "keepdims", "_dtype", "kwargs")
    _defaults = {"kwargs": ()}

    @functools.cached_property
    def chunks(self):
        out = []
        for ax, c in enumerate(self.array.chunks):
            if ax in self.axes:
                if self.keepdims:
                    out.append((1,))
            else:
                out.append(c)
        return tuple(out)

    @functools.cached_property
    def _meta(self):
        dtype = self.operand("_dtype")
        if dtype is not None:
            return np.empty((0,) * len(self.chunks), dtype=np.dtype(dtype))
        return np.empty((0,) * len(self.chunks), dtype=self.array.dtype)

    def _build(self, ctx):
        jnp = _jnp()
        view = ctx.build(self.array)
        nb_in = view.numblocks
        kwargs = dict(self.kwargs or ())
        blocks = {}
        for out_idx in iter_block_indices(self.numblocks):
            ranges = []
            kept_pos = 0
            for ax in range(len(nb_in)):
                if ax in self.axes:
                    ranges.append(range(nb_in[ax]))
                else:
                    if self.keepdims:
                        ranges.append(range(out_idx[ax], out_idx[ax] + 1))
                    else:
                        ranges.append(range(out_idx[kept_pos], out_idx[kept_pos] + 1))
                        kept_pos += 1
            if self.keepdims:
                ranges = [
                    range(out_idx[ax], out_idx[ax] + 1) if ax not in self.axes else range(nb_in[ax])
                    for ax in range(len(nb_in))
                ]

            def rec(ax, prefix):
                if ax == len(ranges):
                    return view.block(prefix)
                parts = [rec(ax + 1, prefix + (i,)) for i in ranges[ax]]
                if len(parts) == 1:
                    return parts[0]
                return jnp.concatenate(parts, axis=ax)

            window = rec(0, ())
            res = self.func(window, axis=self.axes, keepdims=self.keepdims, **kwargs)
            blocks[tuple(out_idx)] = res
        return BlockView(self.chunks, blocks=blocks)


def _normalize_split_every(split_every, axes):
    if split_every is None:
        split_every = config.get("split_every", None)
    if split_every is None:
        return 16
    if isinstance(split_every, dict):
        vals = [v for k, v in split_every.items() if k in axes]
        return builtins.min(vals) if vals else 16
    return int(split_every)


def reduction(
    x,
    chunk,
    aggregate,
    axis=None,
    keepdims=False,
    dtype=None,
    split_every=None,
    combine=None,
    name=None,
    out=None,
    concatenate=True,
    output_size=1,
    meta=None,
    weights=None,
):
    """Generic tree reduction with user chunk/combine/aggregate kernels.

    Parity: ``reduction()`` (``/root/reference/dask_array/reductions/
    _reduction.py:259``).  The chunk function runs per block (keepdims), the
    combine function reduces ``split_every``-sized windows of partials, and
    the aggregate finishes.
    """
    from dask_array_tpu._collection import Array, new_collection
    from dask_array_tpu.ops._map_blocks import map_blocks

    if weights is not None:
        raise NotImplementedError("weights= is not supported yet")
    arr = x if isinstance(x, Array) else new_collection(x)
    axes = _axes_of(arr, axis)
    se = _normalize_split_every(split_every, axes)

    if dtype is not None:
        dtype = np.dtype(dtype)

    # per-block chunk phase (keepdims=True, each block -> size 1 on reduced axes)
    def chunk_fn(block, **kw):
        return chunk(block, axis=axes, keepdims=True)

    from dask_array_tpu._blockwise import Blockwise, _normalize_kwargs

    out_ind = tuple(range(arr.ndim))
    expr = Blockwise(
        chunk_fn,
        out_ind,
        name or f"{getattr(chunk, '__name__', 'reduce')}-chunk",
        dtype,
        _normalize_kwargs({ax: 1 for ax in axes}),
        None,
        True,
        (),
        arr.expr,
        out_ind,
    )

    comb = combine or aggregate
    # tree: combine until <= split_every blocks remain along every reduced axis
    def comb_fn(window, axis=None, keepdims=True, **kw):
        return comb(window, axis=axis, keepdims=keepdims)

    while builtins.max((len(expr.chunks[ax]) for ax in axes), default=1) > se:
        expr = PartialReduce(expr, comb_fn, axes, se, True, dtype, ())

    def agg_fn(window, axis=None, keepdims=False, **kw):
        return aggregate(window, axis=axis, keepdims=keepdims)

    expr = FinalReduce(expr, agg_fn, axes, bool(keepdims), dtype, ())
    return new_collection(expr)


def _tree_reduce(x, aggregate, axis, keepdims, dtype, split_every=None, combine=None, name=None, concatenate=True, reduced_meta=None):
    """Tree-reduce pre-chunked partials (parity helper)."""
    from dask_array_tpu._collection import Array, new_collection

    arr = x if isinstance(x, Array) else new_collection(x)
    axes = _axes_of(arr, axis)
    se = _normalize_split_every(split_every, axes)
    expr = arr.expr
    comb = combine or aggregate

    def comb_fn(window, axis=None, keepdims=True, **kw):
        return comb(window, axis=axis, keepdims=keepdims)

    while builtins.max((len(expr.chunks[ax]) for ax in axes), default=1) > se:
        expr = PartialReduce(expr, comb_fn, axes, se, True, np.dtype(dtype) if dtype else None, ())

    def agg_fn(window, axis=None, keepdims=False, **kw):
        return aggregate(window, axis=axis, keepdims=keepdims)

    expr = FinalReduce(expr, agg_fn, axes, bool(keepdims), np.dtype(dtype) if dtype else None, ())
    return new_collection(expr)


def trace(a, offset=0, axis1=0, axis2=1, dtype=None):
    from dask_array_tpu.ops.routines import diagonal

    return diagonal(a, offset=offset, axis1=axis1, axis2=axis2).sum(axis=-1, dtype=dtype)
