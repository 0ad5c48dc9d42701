"""Per-block kernel functions (the ``dask_array.chunk`` namespace).

Parity: ``/root/reference/dask_array/_chunk.py`` — fresh implementations
over jnp (device) with numpy fallback, usable inside ``map_blocks`` /
``blockwise`` user code.
"""

from __future__ import annotations

import functools
from numbers import Integral

import numpy as np


def _xp(x):
    """The array module matching x (jnp for device/traced arrays)."""
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np
    import jax.numpy as jnp

    return jnp


def concat(seqs):
    """Flatten nested lists of blocks and concatenate along axis 0."""
    parts = list(flatten(seqs))
    xp = _xp(parts[0])
    return xp.concatenate(parts, axis=0)


def flatten(seq, container=list):
    for el in seq:
        if isinstance(el, container):
            yield from flatten(el, container)
        else:
            yield el


def astype(x, astype_dtype=None, **kwargs):
    return x.astype(astype_dtype)


def view(x, dtype, order="C"):
    if order == "C":
        return np.asarray(x).view(dtype)
    x = np.asfortranarray(np.asarray(x))
    return x.T.view(dtype).T


def trim(x, axes=None):
    """Trim ``axes`` elements off every side of every axis."""
    if isinstance(axes, Integral):
        axes = [axes] * x.ndim
    if isinstance(axes, dict):
        axes = [axes.get(i, 0) for i in range(x.ndim)]
    return x[tuple(slice(ax, -ax if ax else None) for ax in axes)]


def keepdims_wrapper(a_callable):
    """Wrap a reduction so it always keeps reduced dimensions."""

    @functools.wraps(a_callable)
    def keepdims_wrapped_callable(x, axis=None, keepdims=None, *args, **kwargs):
        r = a_callable(x, axis=axis, *args, **kwargs)
        if not keepdims:
            return r
        xp = _xp(x)
        if axis is None:
            axes = range(x.ndim)
        elif isinstance(axis, Integral):
            axes = (axis,)
        else:
            axes = axis
        return xp.expand_dims(r, tuple(a % x.ndim for a in axes))

    return keepdims_wrapped_callable


def coarsen(reduction, x, axes, trim_excess=False, **kwargs):
    """Per-block windowed coarsening (see routines.coarsen for the lazy op)."""
    xp = _xp(x)
    if trim_excess:
        sl = tuple(
            slice(0, (x.shape[i] // axes.get(i, 1)) * axes.get(i, 1))
            for i in range(x.ndim)
        )
        x = x[sl]
    new_shape = []
    red = []
    for i, s in enumerate(x.shape):
        f = axes.get(i, 1)
        new_shape.extend([s // f, f])
        red.append(2 * i + 1)
    return reduction(x.reshape(tuple(new_shape)), axis=tuple(red), **kwargs)


def topk(a, k, axis, keepdims=True):
    """k largest along axis (descending), or k smallest ascending for k<0."""
    import jax

    xp = _xp(a)
    if xp is np:
        idx = np.argsort(a, axis=axis)
        sl = [slice(None)] * a.ndim
        if k >= 0:
            sl[axis] = slice(-k, None)
            out = np.take_along_axis(a, idx[tuple(sl)], axis=axis)
            return np.flip(out, axis=axis)
        sl[axis] = slice(None, -k)
        return np.take_along_axis(a, idx[tuple(sl)], axis=axis)
    moved = xp.moveaxis(a, axis, -1)
    if k >= 0:
        vals, _ = jax.lax.top_k(moved, k)
    else:
        vals, _ = jax.lax.top_k(-moved, -k)
        vals = -vals
    return xp.moveaxis(vals, -1, axis)


def topk_aggregate(a, k, axis, keepdims=True):
    return topk(a, k, axis, keepdims)


def argtopk(a, k, axis, keepdims=True):
    """Indices of the k largest (descending) / smallest (ascending, k<0)."""
    import jax

    xp = _xp(a)
    if xp is np:
        idx = np.argsort(a, axis=axis)
        sl = [slice(None)] * a.ndim
        if k >= 0:
            sl[axis] = slice(-k, None)
            return np.flip(idx[tuple(sl)], axis=axis)
        sl[axis] = slice(None, -k)
        return idx[tuple(sl)]
    moved = xp.moveaxis(a, axis, -1)
    if k >= 0:
        _, idxs = jax.lax.top_k(moved, k)
    else:
        _, idxs = jax.lax.top_k(-moved, -k)
    return xp.moveaxis(idxs, -1, axis)


def argtopk_aggregate(a_plus_idx, k, axis, keepdims=True):
    a, idx = a_plus_idx
    sel = argtopk(a, k, axis, keepdims)
    xp = _xp(a)
    return xp.take_along_axis(idx, sel, axis=axis)


def getitem(obj, index):
    """Per-block getitem (the reference copies small slices to release the
    parent block; jax slices never alias host memory, so plain indexing)."""
    return obj[index]


def arange(start, stop, step, length, dtype, like=None):
    import jax.numpy as jnp

    idx = jnp.arange(length)
    return (start + idx * step).astype(dtype)


def linspace(start, stop, num, endpoint=True, dtype=None):
    import jax.numpy as jnp

    return jnp.linspace(start, stop, num, endpoint=endpoint, dtype=dtype)
