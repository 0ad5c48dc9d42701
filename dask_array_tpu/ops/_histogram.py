"""histogram / histogram2d / histogramdd.

Parity: ``/root/reference/dask_array/_histogram.py`` (dask-backed bins and
ranges supported) — fresh implementation.  The whole histogram is one XLA
program (per-block partial histograms + a tree-sum is what the reference
builds; XLA's fused bucketize+scatter-add does the same on-device).
"""

from __future__ import annotations

import builtins

import functools
from numbers import Integral

import numpy as np

from dask_array_tpu._executor import BlockView
from dask_array_tpu._expr import ArrayExpr


def _jnp():
    import jax.numpy as jnp

    return jnp


class Histogram(ArrayExpr):
    _parameters = ("array", "bins", "range_", "weights", "density", "nbins")

    def _name_prefix(self):
        return "histogram"

    @functools.cached_property
    def chunks(self):
        return ((self.nbins,),)

    @functools.cached_property
    def _meta(self):
        if self.density:
            dt = np.dtype("f8")
        elif self.weights is not None:
            dt = np.histogram(np.ones(1), weights=np.ones(1, dtype=self.weights.dtype))[0].dtype
        else:
            dt = np.dtype(np.intp)
        return np.empty((0,), dtype=dt)

    def _build(self, ctx):
        jnp = _jnp()
        dense = ctx.build(self.array).dense().ravel()
        if isinstance(self.bins, ArrayExpr):
            edges = ctx.build(self.bins).dense()
        else:
            edges = jnp.asarray(np.asarray(self.bins))
        w = ctx.build(self.weights).dense().ravel() if isinstance(self.weights, ArrayExpr) else None
        hist, _ = jnp.histogram(dense, bins=edges, weights=w, density=self.density)
        if hist.dtype != self.dtype:
            hist = hist.astype(self.dtype)
        return BlockView(self.chunks, dense=hist)


def _resolve_edges(a, bins, range):
    """Return (edges_spec, nbins, edges_collection_or_numpy)."""
    from dask_array_tpu._collection import Array
    from dask_array_tpu.ops._from_array import from_array

    if isinstance(bins, Array):
        return bins.expr, bins.shape[0] - 1, bins
    if np.ndim(bins) == 1:
        edges = np.asarray(bins, dtype="f8")
        return edges, len(edges) - 1, from_array(edges, chunks=-1)
    # scalar bin count: need a concrete range
    n = int(bins)
    if range is not None:
        lo, hi = range
        lo = float(lo.compute()) if isinstance(lo, Array) else float(lo)
        hi = float(hi.compute()) if isinstance(hi, Array) else float(hi)
    else:
        # dask requires range when bins is an int and a is lazy; we compute
        # the min/max (one extra pass) instead of refusing
        lo = float(a.min().compute())
        hi = float(a.max().compute())
    if lo == hi:
        lo -= 0.5
        hi += 0.5
    edges = np.linspace(lo, hi, n + 1)
    return edges, n, None


def histogram(a, bins=None, range=None, normed=False, weights=None, density=None):
    from dask_array_tpu._collection import Array, new_collection
    from dask_array_tpu.ops._from_array import asarray, from_array

    if bins is None:
        bins = 10
    a = asarray(a)
    if weights is not None:
        weights = asarray(weights)
        if weights.shape != a.shape:
            raise ValueError("weights must have the same shape as the data")
    dens = bool(density) if density is not None else bool(normed)
    edges_spec, nbins, edges_coll = _resolve_edges(a, bins, range)
    expr = Histogram(
        a.expr,
        edges_spec,
        None,
        weights.expr if weights is not None else None,
        dens,
        nbins,
    )
    hist = new_collection(expr)
    if edges_coll is None:
        edges_coll = from_array(np.asarray(edges_spec), chunks=-1)
    elif isinstance(edges_spec, np.ndarray):
        pass
    return hist, edges_coll


def histogram2d(x, y, bins=10, range=None, normed=False, weights=None, density=None):
    from dask_array_tpu.ops.stacking import stack

    if isinstance(bins, (list, tuple)) and len(bins) == 2:
        bins_dd = bins
    else:
        bins_dd = (bins, bins)
    counts, edges = histogramdd(
        (x, y), bins=bins_dd, range=range, normed=normed, weights=weights, density=density
    )
    return counts, edges[0], edges[1]


class HistogramDD(ArrayExpr):
    _parameters = ("weights", "density", "edge_arrays", "shape_")
    # operands[4:] are the coordinate expressions (one per dimension)

    @property
    def coords(self):
        return self.operands[4:]

    @functools.cached_property
    def chunks(self):
        return tuple((s,) for s in self.shape_)

    @functools.cached_property
    def _meta(self):
        dt = np.dtype("f8") if (self.density or self.weights is not None) else np.dtype(np.intp)
        return np.empty((0,) * len(self.shape_), dtype=dt)

    def _build(self, ctx):
        jnp = _jnp()
        coords = [ctx.build(c).dense().ravel() for c in self.coords]
        sample = jnp.stack(coords, axis=-1)
        edges = [jnp.asarray(e) for e in self.edge_arrays]
        w = ctx.build(self.weights).dense().ravel() if isinstance(self.weights, ArrayExpr) else None
        hist, _ = jnp.histogramdd(sample, bins=edges, weights=w, density=self.density)
        if hist.dtype != self.dtype:
            hist = hist.astype(self.dtype)
        return BlockView(self.chunks, dense=hist)


def histogramdd(sample, bins=10, range=None, normed=False, weights=None, density=None):
    from dask_array_tpu._collection import Array, new_collection
    from dask_array_tpu.ops._from_array import asarray, from_array

    if isinstance(sample, Array):
        if sample.ndim != 2:
            raise ValueError("sample array must be 2-D (N, D)")
        d = sample.shape[1]
        coords = [sample[:, i] for i in builtins.range(d)]
    else:
        coords = [asarray(s) for s in sample]
        d = len(coords)
    dens = bool(density) if density is not None else bool(normed)

    if not isinstance(bins, (list, tuple)):
        bins = [bins] * d
    if range is None:
        ranges = [None] * d
    else:
        ranges = list(range)
    edge_arrays = []
    for i in builtins.range(d):
        b = bins[i]
        if np.ndim(b) == 1:
            edge_arrays.append(np.asarray(b, dtype="f8"))
        else:
            n = int(b)
            r = ranges[i]
            if r is None:
                lo = float(coords[i].min().compute())
                hi = float(coords[i].max().compute())
            else:
                lo, hi = float(r[0]), float(r[1])
            if lo == hi:
                lo -= 0.5
                hi += 0.5
            edge_arrays.append(np.linspace(lo, hi, n + 1))
    w = asarray(weights).expr if weights is not None else None
    shape_ = tuple(len(e) - 1 for e in edge_arrays)
    expr = HistogramDD(
        w, dens, tuple(edge_arrays), shape_, *[c.expr for c in coords]
    )
    hist = new_collection(expr)
    edges = [from_array(e, chunks=-1) for e in edge_arrays]
    return hist, edges
