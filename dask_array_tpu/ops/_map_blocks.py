"""map_blocks: apply a function to every block.

Parity: ``/root/reference/dask_array/_map_blocks.py`` — fresh
implementation.  Supports dtype/chunks/drop_axis/new_axis/block_id/
block_info injection; the function runs per block inside the trace (jax
ops) or eagerly (arbitrary host functions) — the executor falls back
automatically when the function is untraceable.
"""

from __future__ import annotations

import functools
from numbers import Integral, Number

import numpy as np

from dask_array_tpu._blockwise import Blockwise, _NHEAD, _normalize_kwargs
from dask_array_tpu._chunks import validate_axis
from dask_array_tpu._executor import BlockView, iter_block_indices
from dask_array_tpu._expr import ArrayExpr, compute_meta


class MapBlocks(Blockwise):
    """Blockwise with optional block_id / block_info injection."""

    _inject_block_id = False
    _inject_block_info = False

    def _accept_shuffle(self, shuffle_expr):
        if type(self)._inject_block_id or self._kwargs_dict.get("__inject_block_id__"):
            return None  # coordinate-reading funcs: do not reorder beneath
        return super()._accept_shuffle(shuffle_expr)

    def _accept_slice(self, index):
        if type(self)._inject_block_id or self._kwargs_dict.get("__inject_block_id__"):
            # culling blocks renumbers block_id beneath the func — the slice
            # must stay above the computed result
            return None
        return super()._accept_slice(index)

    def _call(self, args, kwargs, out_coord):
        if type(self)._inject_block_id or self._kwargs_dict.get("__inject_block_id__"):
            kwargs = dict(kwargs)
            kwargs.pop("__inject_block_id__", None)
            kwargs["block_id"] = tuple(out_coord)
        return self.func(*args, **kwargs)


class MapBlocksInfo(Blockwise):
    """map_blocks with full block_info dicts (locations, chunk bounds)."""

    def _accept_shuffle(self, shuffle_expr):
        # block_info funcs read block coordinates/extents: reordering the
        # inputs beneath them would change what each coordinate means
        return None

    def _accept_slice(self, index):
        # same: slicing the inputs changes every block's coordinates and
        # array-locations as seen by the func
        return None

    def _call(self, args, kwargs, out_coord):
        from dask_array_tpu._chunks import cached_cumsum

        kwargs = dict(kwargs)
        info = {}
        for i, (arr, ind) in enumerate(self.arg_pairs):
            if ind is None or not isinstance(arr, ArrayExpr):
                continue
            coord = tuple(out_coord[self.out_ind.index(lbl)] if lbl in self.out_ind else 0 for lbl in ind)
            bounds = [cached_cumsum(c, initial_zero=True) for c in arr.chunks]
            loc = tuple(
                (int(bounds[ax][min(c, len(arr.chunks[ax]) - 1)]), int(bounds[ax][min(c, len(arr.chunks[ax]) - 1) + 1]))
                for ax, c in enumerate(coord)
            )
            info[i] = {
                "shape": arr.shape,
                "num-chunks": arr.numblocks,
                "chunk-location": coord,
                "array-location": list(loc),
            }
        out_bounds = [cached_cumsum(c, initial_zero=True) for c in self.chunks]
        info[None] = {
            "shape": self.shape,
            "num-chunks": self.numblocks,
            "chunk-location": tuple(out_coord),
            "array-location": [
                (int(out_bounds[ax][c]), int(out_bounds[ax][c + 1])) for ax, c in enumerate(out_coord)
            ],
            "chunk-shape": tuple(
                self.chunks[ax][c] for ax, c in enumerate(out_coord)
            ),
            "dtype": self.dtype,
        }
        kwargs["block_info"] = info
        return self.func(*args, **kwargs)


class ChunksFreeze(ArrayExpr):
    """Layout pin: the chunks advertised HERE are load-bearing, whatever the
    optimizer does to the subtree below (parity: ``ChunksFreeze``,
    ``/root/reference/dask_array/_expr.py:993``).

    The frozen layout is captured as an OPERAND at construction, so even if
    simplify (sliding-window fusion) or a ``_lower`` (reduction trees,
    custom exprs) rewrites the child onto different chunks, consumers that
    froze their input — ``map_blocks`` with ``block_info``/``block_id``
    payloads — still see the layout they were built against.  Delivery is
    free in the dense executor: the child's dense value is re-viewed under
    the frozen chunk grid (no data movement).
    """

    _parameters = ("array", "chunks_")
    _defaults = {"chunks_": None}

    @property
    def chunks(self):
        if self.operand("chunks_") is not None:
            return self.operand("chunks_")
        return self.array.chunks

    @property
    def _meta(self):
        return self.array._meta

    def _build(self, ctx):
        from dask_array_tpu._executor import BlockView

        view = ctx.build(self.array)
        if self.operand("chunks_") is None or view.chunks == self.chunks:
            return view
        return BlockView(self.chunks, dense=view.dense())

    # declines every pushdown (inherited defaults return None)


def freeze(expr: ArrayExpr) -> ArrayExpr:
    """Pin ``expr``'s current chunk layout (idempotent)."""
    if type(expr) is ChunksFreeze:
        return expr
    return ChunksFreeze(expr, tuple(tuple(c) for c in expr.chunks))


def map_blocks(
    func,
    *args,
    name=None,
    token=None,
    dtype=None,
    chunks=None,
    drop_axis=None,
    new_axis=None,
    enforce_ndim=False,
    meta=None,
    **kwargs,
):
    """Apply ``func`` to every block of one or more chunked arrays.

    ``func`` receives aligned blocks (plus ``block_info``/``block_id`` when
    its signature asks for them) and may change dtype (``dtype=``), chunk
    sizes (``chunks=``), or dimensionality (``drop_axis=``/``new_axis=``).
    jax-traceable funcs stay on the compiled fast path; host-only funcs fall
    back to per-block eager execution.  Reference parity:
    ``_map_blocks.py:21``.
    """
    from dask_array_tpu._collection import Array, new_collection
    from dask_array_tpu.ops._from_array import asarray

    if not callable(func):
        raise TypeError("First argument must be callable")
    arrays = [a for a in args if isinstance(a, Array)]
    if not arrays:
        raise ValueError("map_blocks requires at least one Array argument")
    x = arrays[0]
    ndim = max(a.ndim for a in arrays)

    if drop_axis is None:
        drop_axis = []
    elif isinstance(drop_axis, Integral):
        drop_axis = [drop_axis]
    drop_axis = [validate_axis(ax, ndim) for ax in drop_axis]
    out_ndim = ndim - len(drop_axis)
    if new_axis is None:
        new_axis = []
    elif isinstance(new_axis, Integral):
        new_axis = [new_axis]
    new_axis = list(new_axis)
    out_ndim += len(new_axis)

    import inspect

    inject_id = False
    inject_info = False
    try:
        sig = inspect.signature(func)
        params = sig.parameters
        inject_id = "block_id" in params and "block_id" not in kwargs
        inject_info = "block_info" in params and "block_info" not in kwargs
    except (TypeError, ValueError):
        pass

    # build index labels: out gets 0..out_ndim-1; args right-aligned over the
    # non-dropped, non-new axes
    kept_in_axes = [ax for ax in range(ndim) if ax not in drop_axis]
    # label input axes 0..ndim-1; output labels = kept axes relabeled + new axes
    out_labels = []
    new_positions = sorted(validate_axis(ax, out_ndim) for ax in new_axis)
    kept_iter = iter(kept_in_axes)
    new_label_base = ndim
    new_axes_spec = {}
    for pos in range(out_ndim):
        if pos in new_positions:
            lbl = new_label_base
            new_label_base += 1
            out_labels.append(lbl)
            new_axes_spec[lbl] = 1
        else:
            out_labels.append(next(kept_iter))

    # chunks override (per-axis: scalar -> every block that size; tuple ->
    # explicit); applied below via ChunksOverride
    explicit_chunks = None
    if chunks is not None:
        if len(chunks) != out_ndim:
            raise ValueError(
                f"provided chunks have {len(chunks)} dims; expected {out_ndim}"
            )
        explicit_chunks = chunks

    # block_id/block_info payloads are computed against the inputs' layout
    # AT CONSTRUCTION; pin it so optimizer rewrites (sliding-window fusion,
    # lower-time chunk drift) cannot desynchronize the payloads
    pin_inputs = inject_id or inject_info
    pairs = []
    for a in args:
        if isinstance(a, Array):
            ind = tuple(range(ndim - a.ndim, ndim))
            pairs.extend([freeze(a.expr) if pin_inputs else a.expr, ind])
        else:
            pairs.extend([a, None])

    cls = MapBlocksInfo if inject_info else MapBlocks
    kw = dict(kwargs)
    expr = cls(
        func,
        tuple(out_labels),
        token or name or getattr(func, "__name__", "map-blocks") or "map-blocks",
        np.dtype(dtype) if dtype is not None else (getattr(meta, "dtype", None) if meta is not None else None),
        None,
        _normalize_kwargs(new_axes_spec) if new_axes_spec else None,
        True,
        _normalize_kwargs(kw),
        *pairs,
    )
    if inject_id and not inject_info:
        # rebuild as block_id-injecting subclass instance
        expr = _MapBlocksWithId(*expr.operands)

    out = new_collection(expr)
    if explicit_chunks is not None:
        norm = []
        for pos, c in enumerate(explicit_chunks):
            if isinstance(c, (tuple, list)):
                norm.append(tuple(c))
            elif isinstance(c, Number):
                nb = len(expr.chunks[pos]) if pos < len(expr.chunks) else 1
                norm.append((int(c),) * nb)
            else:
                raise ValueError(f"unsupported chunks entry {c!r}")
        # explicit chunks declare block SIZES; the block GRID is fixed by
        # the inputs — a mismatched count would mis-key blocks downstream
        for pos, c in enumerate(norm):
            if pos < len(expr.chunks) and len(c) != len(expr.chunks[pos]):
                raise ValueError(
                    f"map_blocks chunks= declares {len(c)} blocks along axis "
                    f"{pos} but the computation produces "
                    f"{len(expr.chunks[pos])}; chunks= can change block "
                    "SIZES, not the block count"
                )
        out = new_collection(ChunksOverride(expr, tuple(norm)))
    return out


class _MapBlocksWithId(MapBlocks):
    _inject_block_id = True


class ChunksOverride(ArrayExpr):
    """Declare the true output chunks of a map_blocks (the function changed
    block shapes).  Parity: ``ChunksOverride`` (`_expr.py:934`)."""

    _parameters = ("array", "chunks_")

    @property
    def chunks(self):
        return self.chunks_

    @property
    def _meta(self):
        return self.array._meta

    def _build(self, ctx):
        view = ctx.build(self.array)
        # the inner node's declared chunks are wrong; keep its blocks, adopt ours
        if view._blocks is not None:
            return BlockView(self.chunks_, blocks=view.blocks_dict())
        return BlockView(self.chunks_, dense=view._dense)

    def _accept_slice(self, index):
        """Coarse block-cull through the declared grid: out block i is inner
        block i, so a unit-step range keeps blocks [b0, b1) on both sides —
        the inner array takes a block-aligned cut in ITS coordinates, the
        declared chunks narrow to the kept blocks, and a residual slice
        trims outside (parity: reference coarse slice through
        ``ChunksOverride``/map_blocks-with-chunks)."""
        import math
        import numbers

        import numpy as np

        from dask_array_tpu._chunks import cached_cumsum
        from dask_array_tpu._slicing import Slice, is_basic_index

        if not is_basic_index(index) or any(isinstance(i, numbers.Integral) for i in index):
            return None
        inner_index = []
        new_declared = []
        expect_inner = []
        residual = []
        culled = False
        for ax, ind in enumerate(index):
            c = self.chunks_[ax]
            if ind == slice(None):
                inner_index.append(slice(None))
                new_declared.append(tuple(c))
                expect_inner.append(tuple(self.array.chunks[ax]))
                residual.append(slice(None))
                continue
            if ind.step not in (1, None):
                return None
            if any(isinstance(x, float) and math.isnan(x) for x in c):
                return None
            bounds = cached_cumsum(c, initial_zero=True)
            total = int(bounds[-1])
            start = 0 if ind.start is None else int(ind.start)
            stop = total if ind.stop is None else min(int(ind.stop), total)
            if stop <= start or (start == 0 and stop == total):
                inner_index.append(slice(None))
                new_declared.append(tuple(c))
                expect_inner.append(tuple(self.array.chunks[ax]))
                residual.append(ind)
                continue
            b0 = int(np.searchsorted(bounds, start, side="right")) - 1
            b1 = int(np.searchsorted(bounds, stop, side="left"))
            if b0 <= 0 and b1 >= len(c):
                inner_index.append(slice(None))
                new_declared.append(tuple(c))
                expect_inner.append(tuple(self.array.chunks[ax]))
                residual.append(ind)
                continue
            in_c = self.array.chunks[ax]
            if any(isinstance(x, float) and math.isnan(x) for x in in_c):
                return None
            in_bounds = cached_cumsum(in_c, initial_zero=True)
            inner_index.append(slice(int(in_bounds[b0]), int(in_bounds[b1]), 1))
            new_declared.append(tuple(c[b0:b1]))
            expect_inner.append(tuple(in_c[b0:b1]))
            if start == int(bounds[b0]) and stop == int(bounds[b1]):
                residual.append(slice(None))
            else:
                residual.append(slice(start - int(bounds[b0]), stop - int(bounds[b0]), 1))
            culled = True
        if not culled:
            return None
        # the cut is expressed in the inner node's DECLARED coordinates,
        # which lie about the real output extents — so it is only sound if
        # the inner node absorbs it as a whole-block cut (rebuilding itself
        # over cut inputs).  A leftover Slice would index the inner's actual
        # output at the false coordinates; decline instead.
        cut = self.array._accept_slice(tuple(inner_index))
        if cut is None:
            return None
        if tuple(cut.chunks) != tuple(expect_inner):
            return None  # inner did not absorb it as the exact block cut
        out = ChunksOverride(cut, tuple(new_declared))
        if any(r != slice(None) for r in residual):
            out = Slice(out, tuple(residual))
        return out


# ---------------------------------------------------------------------------
# multi-output map_blocks
# ---------------------------------------------------------------------------


class MapBlocksMultiOutput(ArrayExpr):
    """Inner node: func returns a TUPLE of arrays per block.

    Parity: ``map_blocks_multi_output`` / ``MapBlocksOutput``
    (``/root/reference/dask_array/_map_blocks.py:565-650``).  The executor's
    build cache deduplicates this node, so the function runs once per block
    even with several output selectors.
    """

    _parameters = ("func", "n_out", "kwargs")
    # operands[3:] are the input expressions

    @property
    def arrays(self):
        return self.operands[3:]

    @property
    def _array_args(self):
        return [a for a in self.arrays if isinstance(a, ArrayExpr)]

    @property
    def chunks(self):
        return self._array_args[0].chunks  # grid carrier only

    @property
    def _meta(self):
        return self._array_args[0]._meta

    def _build(self, ctx):
        views = [
            ctx.build(a) if isinstance(a, ArrayExpr) else a for a in self.arrays
        ]
        grid = next(v for v in views if isinstance(v, BlockView))
        kwargs = dict(self.kwargs or ())
        blocks = {}
        for idx in iter_block_indices(grid.numblocks):
            args = [v.block(idx) if isinstance(v, BlockView) else v for v in views]
            out = self.func(*args, **kwargs)
            if not isinstance(out, tuple) or len(out) != self.n_out:
                raise ValueError(
                    f"map_blocks_multi_output function must return a tuple of "
                    f"{self.n_out} arrays"
                )
            blocks[tuple(idx)] = out
        return BlockView(self.chunks, blocks=blocks)


class MultiOutputBlock(ArrayExpr):
    """Selector: output ``index`` of a MapBlocksMultiOutput."""

    _parameters = ("inner", "index", "chunks_", "_dtype")

    @property
    def chunks(self):
        return self.chunks_

    @property
    def _meta(self):
        return np.empty((0,) * len(self.chunks_), dtype=self._dtype)

    def _build(self, ctx):
        view = ctx.build(self.inner)
        blocks = {idx: blk[self.index] for idx, blk in view.blocks_dict().items()}
        return BlockView(self.chunks_, blocks=blocks)


def map_blocks_multi_output(func, *args, dtypes, chunkss=None, **kwargs):
    """Apply a function producing several outputs per block.

    ``dtypes``: one dtype per output. ``chunkss``: optional per-output chunk
    tuples (default: the first input's chunks).
    """
    from dask_array_tpu._collection import Array, new_collection

    arrays = [a.expr if isinstance(a, Array) else a for a in args]
    if not any(isinstance(a, ArrayExpr) for a in arrays):
        raise ValueError("map_blocks_multi_output requires at least one Array")
    n_out = len(dtypes)
    inner = MapBlocksMultiOutput(
        func, n_out, tuple(sorted(kwargs.items())), *arrays
    )
    grid_chunks = next(a for a in arrays if isinstance(a, ArrayExpr)).chunks
    outs = []
    for i, dt in enumerate(dtypes):
        ch = tuple(chunkss[i]) if chunkss is not None else grid_chunks
        outs.append(new_collection(MultiOutputBlock(inner, i, ch, np.dtype(dt))))
    return tuple(outs)
