"""Generalized ufuncs: apply_gufunc / gufunc / as_gufunc.

Parity: ``/root/reference/dask_array/_gufunc.py`` — fresh implementation.
Core dimensions are rechunked to a single chunk (the reference's contract);
loop dimensions stay block-parallel via Blockwise.
"""

from __future__ import annotations

import re

import numpy as np

from dask_array_tpu._blockwise import Blockwise, _normalize_kwargs
from dask_array_tpu._expr import compute_meta

_DIMENSION_NAME = r"\w+"
_CORE_DIMENSION_LIST = f"(?:{_DIMENSION_NAME}(?:,{_DIMENSION_NAME})*,?)?"
_ARGUMENT = rf"\({_CORE_DIMENSION_LIST}\)"
_INPUT_ARGUMENTS = f"(?:{_ARGUMENT}(?:,{_ARGUMENT})*,?)?"
_OUTPUT_ARGUMENTS = f"{_ARGUMENT}(?:,{_ARGUMENT})*"
_SIGNATURE = f"^{_INPUT_ARGUMENTS}->{_OUTPUT_ARGUMENTS}$"


def _parse_gufunc_signature(signature):
    signature = signature.replace(" ", "")
    if not re.match(_SIGNATURE, signature):
        raise ValueError(f"Not a valid gufunc signature: {signature}")
    ins, outs = signature.split("->")
    parse = lambda s: [
        tuple(d for d in arg.strip("()").split(",") if d)
        for arg in re.findall(_ARGUMENT, s)
    ]
    in_dims = parse(ins)
    out_dims = parse(outs)
    return in_dims, out_dims


def apply_gufunc(
    func,
    signature,
    *args,
    axes=None,
    axis=None,
    keepdims=False,
    output_dtypes=None,
    output_sizes=None,
    vectorize=None,
    allow_rechunk=False,
    meta=None,
    **kwargs,
):
    """Apply a generalized ufunc ``func`` with ``signature`` over chunked arrays.

    Core dimensions (the signature's bracketed indices) must be single-chunk
    (or ``allow_rechunk=True`` to realign); loop dimensions broadcast and
    stay chunked.  Supports multiple outputs, ``axes``/``axis``/``keepdims``
    with numpy.gufunc semantics, and ``vectorize=True`` to wrap a scalar
    function.  Reference parity: ``_gufunc.py:154``.
    """
    from dask_array_tpu._collection import Array, new_collection
    from dask_array_tpu.ops._from_array import asarray
    from dask_array_tpu.ops.manipulation import expand_dims, moveaxis

    in_dims, out_dims = _parse_gufunc_signature(signature)
    arrays = [asarray(a) for a in args]

    # axis= / axes=: move the named axes to the trailing (core) positions
    # before, and move output core dims back after (numpy.gufunc semantics)
    if axis is not None:
        if axes is not None:
            raise ValueError("cannot pass both axis= and axes=")
        if any(len(cd) > 1 for cd in in_dims + out_dims):
            raise ValueError("axis= requires single-dimension core signatures")
        axes = [(axis,) if cd else () for cd in in_dims] + [
            (axis,) if cd else () for cd in out_dims
        ]
    out_axes_spec = None
    if axes is not None:
        axes = [tuple(a) if isinstance(a, (tuple, list)) else (a,) for a in axes]
        if len(axes) == len(in_dims):
            in_axes = axes
            out_axes_spec = None
        elif len(axes) == len(in_dims) + len(out_dims):
            in_axes = axes[: len(in_dims)]
            out_axes_spec = axes[len(in_dims):]
        else:
            raise ValueError(
                f"axes= must have {len(in_dims)} or {len(in_dims) + len(out_dims)} entries"
            )
        moved = []
        for a, cd, ax in zip(arrays, in_dims, in_axes):
            if len(ax) != len(cd):
                raise ValueError("axes entry length must match core dims")
            if ax and tuple(x % a.ndim for x in ax) != tuple(
                range(a.ndim - len(cd), a.ndim)
            ):
                a = moveaxis(a, ax, tuple(range(a.ndim - len(cd), a.ndim)))
            moved.append(a)
        arrays = moved
    if len(arrays) != len(in_dims):
        raise ValueError(
            f"signature expects {len(in_dims)} arguments, got {len(arrays)}"
        )

    if vectorize:
        import jax.numpy as jnp

        func = jnp.vectorize(func, signature=signature)

    # loop dims per argument (leading, broadcastable)
    nloop = max(a.ndim - len(cd) for a, cd in zip(arrays, in_dims))
    if nloop < 0:
        raise ValueError("input has fewer dimensions than its signature core dims")

    # label space: loop labels are ints 0..nloop-1, core labels are strings
    # core-size consistency + rechunk core dims single-chunk
    core_sizes: dict = dict(output_sizes or {})
    new_arrays = []
    for a, cd in zip(arrays, in_dims):
        nl = a.ndim - len(cd)
        target = list(a.chunks)
        needs = False
        for pos, label in enumerate(cd):
            ax = nl + pos
            size = a.shape[ax]
            if label in core_sizes and core_sizes[label] != size and not str(label).isdigit():
                raise ValueError(
                    f"core dimension {label!r} has inconsistent sizes "
                    f"{core_sizes[label]} vs {size}"
                )
            core_sizes.setdefault(label, size)
            if len(a.chunks[ax]) > 1:
                if not allow_rechunk:
                    raise ValueError(
                        f"core dimension {label!r} is chunked along axis {ax}; "
                        "pass allow_rechunk=True (or rechunk to a single chunk)"
                    )
                target[ax] = (size,)
                needs = True
        new_arrays.append(a.rechunk(tuple(target)) if needs else a)
    arrays = new_arrays

    # Blockwise index labels
    loop_labels = tuple(range(nloop))
    out_specs = []
    for od in out_dims:
        for label in od:
            if label not in core_sizes:
                raise ValueError(
                    f"output core dimension {label!r} has unknown size; pass "
                    "output_sizes="
                )

    pairs = []
    for a, cd in zip(arrays, in_dims):
        nl = a.ndim - len(cd)
        ind = tuple(loop_labels[nloop - nl:]) + tuple(f"c_{label}" for label in cd)
        pairs.extend([a.expr, ind])

    if not isinstance(output_dtypes, (list, tuple)):
        output_dtypes_list = [output_dtypes] * len(out_dims)
    else:
        output_dtypes_list = list(output_dtypes)

    results = []
    for i, od in enumerate(out_dims):
        out_ind = loop_labels + tuple(f"c_{label}" for label in od)
        new_axes = {f"c_{label}": core_sizes[label] for label in od}
        # labels that only appear in outputs are new axes; shared core labels
        # come from the (single-chunk) inputs
        input_core = {f"c_{label}" for cd in in_dims for label in cd}
        new_axes = {k: v for k, v in new_axes.items() if k not in input_core}
        nouts = len(out_dims)

        if nouts == 1:
            fn = func
        else:
            def fn(*a, _i=i, **kw):
                return func(*a, **kw)[_i]

        dtype = output_dtypes_list[i]
        expr = Blockwise(
            fn,
            out_ind,
            getattr(func, "__name__", "gufunc") or "gufunc",
            np.dtype(dtype) if dtype is not None else None,
            None,
            _normalize_kwargs(new_axes) if new_axes else None,
            True,
            _normalize_kwargs(kwargs),
            *pairs,
        )
        out_arr = new_collection(expr)
        if keepdims and not od:
            insert_at = axis if axis is not None else -1
            out_arr = expand_dims(out_arr, insert_at % (out_arr.ndim + 1))
        elif out_axes_spec is not None and od:
            ax_spec = out_axes_spec[i]
            want = tuple(x % out_arr.ndim for x in ax_spec)
            have = tuple(range(out_arr.ndim - len(od), out_arr.ndim))
            if want != have:
                out_arr = moveaxis(out_arr, have, want)
        results.append(out_arr)
    if len(results) == 1:
        return results[0]
    return tuple(results)


class gufunc:
    """Binds a function + signature; parity: ``gufunc`` (``_gufunc.py:544``)."""

    def __init__(
        self,
        pyfunc,
        *,
        signature=None,
        vectorize=None,
        axes=None,
        axis=None,
        keepdims=False,
        output_sizes=None,
        output_dtypes=None,
        allow_rechunk=False,
    ):
        self.pyfunc = pyfunc
        self.signature = signature
        self.vectorize = vectorize
        self.axes = axes
        self.axis = axis
        self.keepdims = keepdims
        self.output_sizes = output_sizes
        self.output_dtypes = output_dtypes
        self.allow_rechunk = allow_rechunk
        self.__doc__ = getattr(pyfunc, "__doc__", None)
        self.__name__ = getattr(pyfunc, "__name__", "gufunc")

    def __call__(self, *args, **kwargs):
        return apply_gufunc(
            self.pyfunc,
            self.signature,
            *args,
            vectorize=self.vectorize,
            axes=self.axes,
            axis=self.axis,
            keepdims=self.keepdims,
            output_sizes=self.output_sizes,
            output_dtypes=self.output_dtypes,
            allow_rechunk=self.allow_rechunk,
            **kwargs,
        )


def as_gufunc(signature=None, **kwargs):
    """Decorator version: ``@as_gufunc("(i),(i)->()")``."""

    def _as_gufunc(pyfunc):
        return gufunc(pyfunc, signature=signature, **kwargs)

    _as_gufunc.__doc__ = as_gufunc.__doc__
    return _as_gufunc
