"""Overlap / map_overlap: ghost-cell (halo) machinery for stencils.

Parity: ``/root/reference/dask_array/_overlap.py`` (``OverlapInternal``,
boundary modes periodic/reflect/nearest/constant/none, ``map_overlap``
pipeline, ``sliding_window_view``, ``push``) — fresh implementation.

TPU-first: a block-with-halo is a *slice of the boundary-extended dense
array*, so inside one chip the "halo exchange" is free (XLA fuses the
overlapping reads), and over a mesh the sharding propagation turns the
out-of-shard reads into exactly the neighbor ppermute/collective-permute
the reference's task-based halo exchange emulates.
"""

from __future__ import annotations

import functools
from numbers import Integral, Number

import numpy as np

from dask_array_tpu._chunks import cached_cumsum, validate_axis
from dask_array_tpu._executor import BlockView, iter_block_indices
from dask_array_tpu._expr import ArrayExpr


def _jnp():
    import jax.numpy as jnp

    return jnp


def coerce_depth(ndim, depth):
    """depth -> {axis: (lo, hi)}"""
    if isinstance(depth, Integral):
        depth = (int(depth),) * ndim
    if isinstance(depth, (list, tuple)):
        depth = dict(enumerate(depth))
    out = {}
    for ax in range(ndim):
        d = depth.get(ax, 0)
        if isinstance(d, Integral):
            out[ax] = (int(d), int(d))
        else:
            out[ax] = (int(d[0]), int(d[1]))
    return out


def coerce_boundary(ndim, boundary):
    """boundary -> {axis: mode} with mode in {'reflect','periodic','nearest',
    'none'} or a constant fill value."""
    if boundary is None:
        boundary = "none"
    if not isinstance(boundary, dict):
        if isinstance(boundary, (list, tuple)):
            boundary = dict(enumerate(boundary))
        else:
            boundary = {ax: boundary for ax in range(ndim)}
    return {ax: boundary.get(ax, "none") for ax in range(ndim)}


# dask's "reflect" includes the edge element (x[depth-1::-1] — reference
# ``_overlap.py:733``), which is numpy's "symmetric", NOT numpy's "reflect"
_PAD_MODE = {"reflect": "symmetric", "periodic": "wrap", "nearest": "edge"}


class Overlap(ArrayExpr):
    """Each block grows by its halo (ghost cells from neighbors/boundary)."""

    _parameters = ("array", "depth", "boundary")  # both: tuple of per-axis entries

    @functools.cached_property
    def _depth_map(self):
        return {ax: d for ax, d in enumerate(self.depth)}

    @functools.cached_property
    def _boundary_map(self):
        return {ax: b for ax, b in enumerate(self.boundary)}

    @functools.cached_property
    def chunks(self):
        out = []
        for ax, c in enumerate(self.array.chunks):
            lo, hi = self.depth[ax]
            bd = self.boundary[ax]
            axis = []
            n = len(c)
            for i, size in enumerate(c):
                add_lo = lo if (i > 0 or bd != "none") else 0
                add_hi = hi if (i < n - 1 or bd != "none") else 0
                axis.append(size + add_lo + add_hi)
            out.append(tuple(axis))
        return tuple(out)

    @property
    def _meta(self):
        return self.array._meta

    def transfer_bytes(self):
        """Halo bytes moved between blocks (parity: `_overlap.py:92`)."""
        itemsize = self.dtype.itemsize
        total = 0
        for ax, c in enumerate(self.array.chunks):
            lo, hi = self.depth[ax]
            other = 1
            for ax2, c2 in enumerate(self.array.chunks):
                if ax2 != ax:
                    other *= sum(c2)
            total += (lo + hi) * max(0, len(c) - 1) * other * itemsize
        return (total, total)

    def _build(self, ctx):
        jnp = _jnp()
        view = ctx.build(self.array)
        dense = view.dense()

        # boundary-extend the dense array per axis
        offsets = []
        for ax in range(dense.ndim):
            lo, hi = self.depth[ax]
            bd = self.boundary[ax]
            if bd == "none" or (lo == 0 and hi == 0):
                offsets.append(0)
                continue
            pw = [(0, 0)] * dense.ndim
            pw[ax] = (lo, hi)
            if bd in _PAD_MODE:
                dense = jnp.pad(dense, pw, mode=_PAD_MODE[bd])
            else:
                dense = jnp.pad(dense, pw, mode="constant", constant_values=bd)
            offsets.append(lo)

        bounds = [cached_cumsum(c, initial_zero=True) for c in self.array.chunks]
        blocks = {}
        n_ax = [len(c) for c in self.array.chunks]
        for idx in iter_block_indices(tuple(n_ax)):
            sl = []
            for ax, i in enumerate(idx):
                lo, hi = self.depth[ax]
                bd = self.boundary[ax]
                start = bounds[ax][i] + offsets[ax]
                stop = bounds[ax][i + 1] + offsets[ax]
                take_lo = lo if (i > 0 or bd != "none") else 0
                take_hi = hi if (i < n_ax[ax] - 1 or bd != "none") else 0
                sl.append(slice(start - take_lo, stop + take_hi))
            blocks[tuple(idx)] = dense[tuple(sl)]
        return BlockView(self.chunks, blocks=blocks)


class TrimInternal(ArrayExpr):
    """Shave halos back off every block (parity: ``trim_internal``)."""

    _parameters = ("array", "depth", "boundary")

    @functools.cached_property
    def chunks(self):
        out = []
        for ax, c in enumerate(self.array.chunks):
            lo, hi = self.depth[ax]
            bd = self.boundary[ax]
            axis = []
            n = len(c)
            for i, size in enumerate(c):
                cut_lo = lo if (i > 0 or bd != "none") else 0
                cut_hi = hi if (i < n - 1 or bd != "none") else 0
                axis.append(size - cut_lo - cut_hi)
            out.append(tuple(axis))
        return tuple(out)

    @property
    def _meta(self):
        return self.array._meta

    def _build(self, ctx):
        view = ctx.build(self.array)
        blocks = {}
        n_ax = view.numblocks
        for idx in iter_block_indices(n_ax):
            b = view.block(idx)
            sl = []
            for ax, i in enumerate(idx):
                lo, hi = self.depth[ax]
                bd = self.boundary[ax]
                cut_lo = lo if (i > 0 or bd != "none") else 0
                cut_hi = hi if (i < n_ax[ax] - 1 or bd != "none") else 0
                sl.append(slice(cut_lo, b.shape[ax] - cut_hi))
            blocks[tuple(idx)] = b[tuple(sl)]
        return BlockView(self.chunks, blocks=blocks)


def _normalize(x, depth, boundary):
    depth_map = coerce_depth(x.ndim, depth)
    bd_map = coerce_boundary(x.ndim, boundary)
    dep = tuple(depth_map[ax] for ax in range(x.ndim))
    bd = tuple(bd_map[ax] for ax in range(x.ndim))
    return dep, bd


def overlap(x, depth, boundary=None, *, allow_rechunk=True):
    """Add ghost cells to every block."""
    from dask_array_tpu._collection import new_collection
    from dask_array_tpu.ops._from_array import asarray

    x = asarray(x)
    dep, bd = _normalize(x, depth, boundary)
    # every chunk must be at least as large as the halo it donates
    for ax, (lo, hi) in enumerate(dep):
        if (lo or hi) and len(x.chunks[ax]) > 1:
            m = min(x.chunks[ax])
            if m < max(lo, hi):
                if not allow_rechunk:
                    raise ValueError(
                        f"overlap depth {max(lo, hi)} exceeds the smallest chunk "
                        f"({m}) along axis {ax}; rechunk first"
                    )
                # merge neighboring chunks until each is >= the halo depth
                target = list(x.chunks)
                merged = []
                acc = 0
                need = max(lo, hi)
                for c in x.chunks[ax]:
                    acc += c
                    if acc >= need:
                        merged.append(acc)
                        acc = 0
                if acc:
                    if merged:
                        merged[-1] += acc
                    else:
                        merged.append(acc)
                target[ax] = tuple(merged)
                x = x.rechunk(tuple(target))
    return new_collection(Overlap(x.expr, dep, bd))


def trim_internal(x, axes, boundary=None):
    from dask_array_tpu._collection import new_collection

    dep, bd = _normalize(x, axes, boundary)
    return new_collection(TrimInternal(x.expr, dep, bd))


def trim_overlap(x, depth, boundary=None):
    return trim_internal(x, depth, boundary=boundary)


def map_overlap(func, *args, depth=None, boundary=None, trim=True, align_arrays=True, allow_rechunk=True, **kwargs):
    """Apply ``func`` to blocks (of one or MORE arrays) with ghost cells.

    Parity: ``map_overlap`` (``_overlap.py:1041-1300``); the pipeline is
    align -> overlap each array -> map_blocks -> trim (``:428-454``).
    ``depth``/``boundary`` may be lists with one entry per array; arrays of
    different ndim block-broadcast (right-aligned), and trimming uses the
    highest-rank array's depth.  Trimming slices relative to each ACTUAL
    output block, so funcs that change block sizes (declared via
    ``chunks=``) trim correctly.
    """
    from dask_array_tpu._collection import Array
    from dask_array_tpu.ops._map_blocks import map_blocks

    if isinstance(func, Array) and args and callable(args[0]):
        # legacy map_overlap(x, func, ...) signature
        func, args = args[0], (func,) + args[1:]
    if not callable(func):
        raise TypeError(
            f"First argument must be callable function, not {type(func).__name__}\n"
            "Usage:   da.map_overlap(function, x)\n"
            "   or:   da.map_overlap(function, x, y, z)"
        )
    if not args or not all(isinstance(a, Array) for a in args):
        raise TypeError(
            "All variadic arguments must be arrays, not "
            f"{[type(a).__name__ for a in args]}\n"
            "Usage:   da.map_overlap(function, x)\n"
            "   or:   da.map_overlap(function, x, y, z)"
        )
    arrays = list(args)

    def coerce(xs, arg, fn):
        if not isinstance(arg, list):
            arg = [arg] * len(xs)
        if len(arg) != len(xs):
            raise ValueError(
                f"got {len(arg)} entries for {len(xs)} array arguments; a "
                "list-form depth/boundary needs one entry per array"
            )
        return [fn(x.ndim, a) for x, a in zip(xs, arg)]

    depths = coerce(arrays, 0 if depth is None else depth, coerce_depth)
    bounds = coerce(arrays, boundary, coerce_boundary)

    if align_arrays and len(arrays) > 1:
        from dask_array_tpu.ops.routines import unify_chunks

        ndim = max(a.ndim for a in arrays)
        uargs = []
        for a in arrays:
            uargs += [a, tuple(range(ndim - a.ndim, ndim))]
        _, arrays = unify_chunks(*uargs)

    # depth 0 everywhere: plain map_blocks (more efficient, parity :1271)
    if all(lo == 0 and hi == 0 for d in depths for (lo, hi) in d.values()):
        return map_blocks(func, *arrays, **kwargs)

    for i, (a, d, b) in enumerate(zip(arrays, depths, bounds)):
        for ax in range(a.ndim):
            lo, hi = d[ax]
            if lo != hi and b[ax] != "none":
                raise NotImplementedError(
                    "Asymmetric overlap is currently only implemented "
                    "for boundary='none', however boundary for dimension "
                    f"{ax} in array argument {i} is {b[ax]}"
                )

    overlapped = [
        overlap(a, d, b, allow_rechunk=allow_rechunk)
        for a, d, b in zip(arrays, depths, bounds)
    ]
    mapped = map_blocks(func, *overlapped, **kwargs)
    if trim:
        # trim by the highest-rank array's halo (ties -> first; parity :448)
        i = sorted(enumerate(arrays), key=lambda v: (v[1].ndim, -v[0]))[-1][0]
        return trim_internal(mapped, depths[i], bounds[i])
    return mapped


# ---------------------------------------------------------------------------
# sliding windows
# ---------------------------------------------------------------------------


class SlidingWindowView(ArrayExpr):
    """numpy.lib.stride_tricks.sliding_window_view semantics.

    Window axes are appended as trailing single-chunk dims; the windowed
    source axes lose (window-1) from their final chunk (parity:
    ``SlidingWindowView``, ``_overlap.py:457``).
    """

    _parameters = ("array", "window_shape", "axes")

    @functools.cached_property
    def chunks(self):
        out = [list(c) for c in self.array.chunks]
        for w, ax in zip(self.window_shape, self.axes):
            shrink = w - 1
            axis = out[ax]
            i = len(axis) - 1
            while shrink > 0 and i >= 0:
                cut = min(shrink, axis[i])
                axis[i] -= cut
                shrink -= cut
                i -= 1
            out[ax] = [c for c in axis if c > 0] or [0]
        lead = tuple(tuple(c) for c in out)
        trail = tuple((w,) for w in self.window_shape)
        return lead + trail

    @property
    def _meta(self):
        return np.empty((0,) * (self.array.ndim + len(self.axes)), dtype=self.array.dtype)

    def _simplify_up(self, parent, dependents):
        # fuse reduce(sliding_window_view(x)) over the window dim into one
        # lax.reduce_window (parity: the SlidingWindowView->Reduction fusion,
        # /root/reference/dask_array/_overlap.py:457-623)
        from dask_array_tpu.ops.reductions import Reduction
        from dask_array_tpu.ops._sliding import (
            FUSABLE_WINDOW_REDUCERS,
            SlidingWindowReduce,
        )

        if (
            type(parent) is Reduction
            and not parent.keepdims
            and parent.kind in FUSABLE_WINDOW_REDUCERS
            and len(self.window_shape) == 1
            and parent.axes == (self.array.ndim,)  # exactly the window dim
        ):
            deps = dependents.get(self._name, ())
            if any(d._name != parent._name for d in deps):
                return None
            return SlidingWindowReduce(
                self.array,
                parent.kind,
                self.window_shape[0],
                self.axes[0],
                parent.dtype,
            )
        return super()._simplify_up(parent, dependents)

    def _build(self, ctx):
        jnp = _jnp()
        dense = ctx.build(self.array).dense()
        out = dense
        nd0 = dense.ndim
        for j, (w, ax) in enumerate(zip(self.window_shape, self.axes)):
            n = out.shape[ax]
            starts = jnp.arange(n - w + 1)
            offs = jnp.arange(w)
            idx = starts[:, None] + offs[None, :]  # (n-w+1, w)
            out = jnp.take(out, idx.reshape(-1), axis=ax)
            # axis now has length (n-w+1)*w: split into (n-w+1, w), move w last
            new_shape = out.shape[:ax] + (n - w + 1, w) + out.shape[ax + 1:]
            out = out.reshape(new_shape)
            out = jnp.moveaxis(out, ax + 1, len(new_shape) - 1)
        return BlockView(self.chunks, dense=out)


def sliding_window_view(x, window_shape, axis=None, **kwargs):
    from dask_array_tpu._collection import new_collection
    from dask_array_tpu.ops._from_array import asarray

    x = asarray(x)
    if isinstance(window_shape, Integral):
        window_shape = (int(window_shape),)
    window_shape = tuple(int(w) for w in window_shape)
    if axis is None:
        if len(window_shape) != x.ndim:
            raise ValueError("window_shape must match ndim when axis is None")
        axes = tuple(range(x.ndim))
    else:
        if isinstance(axis, Integral):
            axes = (validate_axis(axis, x.ndim),)
        else:
            axes = tuple(validate_axis(a, x.ndim) for a in axis)
    if len(axes) != len(window_shape):
        raise ValueError("window_shape and axis must have the same length")
    for w, ax in zip(window_shape, axes):
        if w > x.shape[ax]:
            raise ValueError("window shape cannot be larger than input array shape")
        if w < 1:
            raise ValueError("`window_shape` must contain positive values")
    return new_collection(SlidingWindowView(x.expr, window_shape, axes))


# ---------------------------------------------------------------------------
# push (forward-fill)
# ---------------------------------------------------------------------------


class Push(ArrayExpr):
    """bottleneck.push semantics: forward-fill NaNs along an axis, at most
    ``n`` positions (None = unlimited).  One XLA associative scan."""

    _parameters = ("array", "n", "axis")

    @property
    def chunks(self):
        return self.array.chunks

    @functools.cached_property
    def _meta(self):
        dt = self.array.dtype
        if not np.issubdtype(dt, np.floating):
            dt = np.dtype("f8")
        return np.empty((0,) * self.array.ndim, dtype=dt)

    def _build(self, ctx):
        import jax

        jnp = _jnp()
        dense = ctx.build(self.array).dense().astype(self.dtype)
        axis = self.axis
        mc = self.n if self.n is not None else np.iinfo(np.int32).max

        # associative segment summaries: (v = last valid value in segment,
        # g = trailing-invalid count, has = any valid in segment)
        valid = ~jnp.isnan(dense)
        v0 = jnp.where(valid, dense, 0.0)
        g0 = jnp.where(valid, 0, 1).astype(jnp.int32)
        h0 = valid

        def combine(a, b):
            av, ag, ah = a
            bv, bg, bh = b
            v = jnp.where(bh, bv, av)
            g = bg + jnp.where(bh, 0, ag)
            h = ah | bh
            return (v, g, h)

        v, g, h = jax.lax.associative_scan(combine, (v0, g0, h0), axis=axis)
        out = jnp.where(h & (g <= mc), v, jnp.nan)
        return BlockView(self.chunks, dense=out)


def push(array, n=None, axis=-1):
    from dask_array_tpu._collection import new_collection
    from dask_array_tpu.ops._from_array import asarray

    array = asarray(array)
    axis = validate_axis(axis, array.ndim)
    return new_collection(Push(array.expr, int(n) if n is not None else None, axis))


# slice pushdown for overlap: slices on axes WITHOUT halo commute
def _overlap_accept_slice(self, index):
    from numbers import Integral

    from dask_array_tpu._slicing import Slice, is_basic_index

    if not is_basic_index(index):
        return None
    for ax, ind in enumerate(index):
        if ind == slice(None):
            continue
        lo, hi = self.depth[ax]
        if lo or hi or isinstance(ind, Integral):
            return None  # halo axis (or rank-changing): keep the slice outside
    if all(i == slice(None) for i in index):
        return None
    return type(self)(Slice(self.array, tuple(index)), self.depth, self.boundary)


Overlap._accept_slice = _overlap_accept_slice
TrimInternal._accept_slice = _overlap_accept_slice
