"""Slice/shuffle-pushdown parity, fifth batch — the remaining reference
test names (/root/reference/dask_array/tests/test_slice_pushdown.py) with
no same-name analog here.

List indexing lowers to ``Take`` (this framework's Shuffle-protocol
reorder), not the reference's Shuffle class; region pushdown DEFERS the
source read via ``FromArray.region`` for every source kind (the reference
eagerly copies small numpy regions — deferral is strictly lazier and what
its zarr path does).
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._blockwise import Blockwise, Elemwise
from dask_array_tpu._test_utils import assert_eq


def _walk(expr, seen=None):
    if seen is None:
        seen = {}
    if expr._name in seen:
        return seen
    seen[expr._name] = expr
    for op in expr.operands:
        if hasattr(op, "_name") and hasattr(op, "operands"):
            _walk(op, seen)
    return seen


# ---------------------------------------------------------------------------
# region pushdown into from_array
# ---------------------------------------------------------------------------


def test_expression_structure():
    from dask_array_tpu.ops._from_array import FromArray

    x = da.from_array(np.arange(100).reshape(10, 10), chunks=(2, 2))
    y = x[0:2, 0:2]
    assert isinstance(y.optimize().expr, FromArray)


def test_region_numpy_slice():
    arr = np.arange(10000).reshape(100, 100)
    x = da.from_array(arr, chunks=(10, 10))
    y = x[12:18, 34:39]
    opt = y.optimize().expr
    # the region rides the leaf (deferred read of just that window)
    assert opt.region == (slice(12, 18, 1), slice(34, 39, 1))
    assert opt.chunks == ((6,), (5,))
    assert_eq(y, arr[12:18, 34:39])


def test_region_numpy_full_slice_does_not_copy():
    arr = np.arange(10000).reshape(100, 100)
    x = da.from_array(arr, chunks=(10, 10))
    opt = x[:, :].optimize().expr
    assert opt._name == x.optimize().expr._name
    assert opt.source is x.expr.source
    assert opt.region is None


def test_region_numpy_large_slice_stays_deferred():
    # a large slice never copies the source during optimization — the
    # region stays deferred on the leaf (this framework defers every
    # region; the reference only defers past a bytes limit)
    arr = np.arange(100).reshape(10, 10)
    x = da.from_array(arr, chunks=(5, 5))
    opt = x[:5, :5].optimize().expr
    assert opt.source is x.expr.source
    assert opt.region == (slice(None, 5, None), slice(None, 5, None)) or opt.region == (
        slice(0, 5, 1),
        slice(0, 5, 1),
    )
    assert opt.chunks == ((5,), (5,))


def test_region_multiple_chunks():
    arr = np.arange(10000).reshape(100, 100)
    x = da.from_array(arr, chunks=(10, 10))
    y = x[15:25, 35:45]
    assert_eq(y, arr[15:25, 35:45])
    assert y.optimize().expr.chunks == ((5, 5), (5, 5))


class _RecordingStore:
    """zarr/h5py-style chunked source: .chunks granules, recorded reads."""

    def __init__(self, shape, chunks):
        self.data = np.arange(np.prod(shape), dtype="f8").reshape(shape)
        self.shape = shape
        self.dtype = self.data.dtype
        self.chunks = chunks
        self.calls = []
        self.ndim = len(shape)

    def __getitem__(self, sl):
        self.calls.append(sl)
        return self.data[sl]


def test_region_zarr_deferred():
    # chunked-store slicing is deferred: compute reads ONLY the touched
    # granules (stronger than the reference's "graph holds the zarr handle")
    store = _RecordingStore((100, 100), (10, 10))
    x = da.from_array(store)
    y = x[15:25, 35:45]
    assert not store.calls  # nothing read during construction/optimize
    assert_eq(y, store.data[15:25, 35:45])
    read_rows = sorted({(s[0].start, s[0].stop) for s in store.calls})
    read_cols = sorted({(s[1].start, s[1].stop) for s in store.calls})
    assert all(start >= 10 and stop <= 30 for start, stop in read_rows)
    assert all(start >= 30 and stop <= 50 for start, stop in read_cols)


def test_integer_indexing_pushdown():
    arr = np.arange(100).reshape(10, 10)
    x = da.from_array(arr, chunks=(5, 5))
    y = x[3, 7]
    assert len(dict(y.optimize().dask)) == 1
    assert_eq(y, arr[3, 7])
    assert_eq(x[:3, 5], arr[:3, 5])
    assert_eq(x[5, 2:8], arr[5, 2:8])


def test_no_cull_slice_stays_above_computed_nodes():
    # a persisted (already-computed) subtree is opaque: the slice stays
    # above it rather than rewriting into it, and values are correct
    arr = np.arange(40.0)
    x = da.from_array(arr, chunks=(8,))
    p = (x + 1).persist()
    y = p[7:39]
    opt = y.optimize().expr
    assert opt.chunks[0] != (8,) * 5 or opt.shape == (32,)
    assert_eq(y, arr[7:39] + 1)


# ---------------------------------------------------------------------------
# slice through reduction
# ---------------------------------------------------------------------------


def test_slice_through_reduction_optimization():
    x = da.ones((100, 100), chunks=(10, 10))
    y = x.sum(axis=0)[:5]
    expected = x[:, :5].sum(axis=0)
    assert y.expr.simplify()._name == expected.expr.simplify()._name


def test_slice_through_reduction_reduces_tasks():
    arr = np.arange(10000).reshape(100, 100)
    x = da.from_array(arr, chunks=(10, 10))
    full_tasks = len(dict(x.sum(axis=0).optimize().dask))
    sliced = x.sum(axis=0)[:5]
    assert len(dict(sliced.optimize().dask)) < full_tasks
    assert_eq(sliced, arr.sum(axis=0)[:5])


# ---------------------------------------------------------------------------
# slice absorbs into creation
# ---------------------------------------------------------------------------


def test_slice_ones_returns_smaller_ones():
    from dask_array_tpu.ops.creation import Ones

    x = da.ones((100, 100), chunks=(10, 10))
    simplified = x[:15, :25].expr.simplify()
    assert isinstance(simplified, Ones)
    assert simplified.shape == (15, 25)


def test_slice_zeros_returns_smaller_zeros():
    from dask_array_tpu.ops.creation import Zeros

    x = da.zeros((100, 100), chunks=(10, 10))
    simplified = x[:15, :25].expr.simplify()
    assert isinstance(simplified, Zeros)
    assert simplified.shape == (15, 25)


def test_slice_full_returns_smaller_full():
    from dask_array_tpu.ops.creation import Full

    x = da.full((100, 100), 42, chunks=(10, 10))
    y = x[:15, :25]
    simplified = y.expr.simplify()
    assert isinstance(simplified, Full)
    assert simplified.shape == (15, 25)
    assert_eq(y, np.full((15, 25), 42))


# ---------------------------------------------------------------------------
# slice through concat / stack / broadcast_to
# ---------------------------------------------------------------------------


def test_slice_through_concat_same_axis_spans_arrays():
    a = da.ones((10, 5), chunks=5)
    b = da.ones((10, 5), chunks=5)
    c = da.ones((10, 5), chunks=5)
    result = da.concatenate([a, b, c], axis=0)[5:15]
    expected = da.concatenate([a[5:], b[:5]], axis=0)
    assert result.expr.simplify()._name == expected.expr.simplify()._name


def test_slice_through_concat_correctness():
    a = np.arange(20).reshape(4, 5)
    b = np.arange(20, 40).reshape(4, 5)
    da_a = da.from_array(a, chunks=2)
    da_b = da.from_array(b, chunks=2)
    assert_eq(da.concatenate([da_a, da_b], axis=0)[:3], np.concatenate([a, b], axis=0)[:3])
    assert_eq(
        da.concatenate([da_a, da_b], axis=0)[:, :3], np.concatenate([a, b], axis=0)[:, :3]
    )
    assert_eq(da.concatenate([da_a, da_b], axis=0)[2:6], np.concatenate([a, b], axis=0)[2:6])


def test_slice_through_concat_reduces_tasks():
    a = da.ones((100, 100), chunks=10)
    b = da.ones((100, 100), chunks=10)
    concat = da.concatenate([a, b], axis=0)
    assert len(dict(concat[:5].optimize().dask)) < len(dict(concat.optimize().dask))


def test_slice_through_stack_correctness():
    a = np.arange(20).reshape(4, 5)
    b = np.arange(20, 40).reshape(4, 5)
    c = np.arange(40, 60).reshape(4, 5)
    da_a, da_b, da_c = (da.from_array(v, chunks=2) for v in (a, b, c))
    assert_eq(da.stack([da_a, da_b, da_c], axis=0)[:2], np.stack([a, b, c], axis=0)[:2])
    assert_eq(
        da.stack([da_a, da_b, da_c], axis=0)[:, :2, :3],
        np.stack([a, b, c], axis=0)[:, :2, :3],
    )


def test_slice_through_stack_reduces_tasks():
    a = da.ones((100, 100), chunks=10)
    b = da.ones((100, 100), chunks=10)
    c = da.ones((100, 100), chunks=10)
    stacked = da.stack([a, b, c], axis=0)
    assert len(dict(stacked[:1].optimize().dask)) < len(dict(stacked.optimize().dask))


def test_slice_through_broadcast_to_new_dim():
    x = da.ones((10,), chunks=5)
    result = da.broadcast_to(x, (20, 10))[:5, :]
    expected = da.broadcast_to(x, (5, 10))
    assert result.expr.simplify()._name == expected.expr.simplify()._name


def test_slice_through_broadcast_to_existing_dim():
    x = da.ones((10,), chunks=5)
    result = da.broadcast_to(x, (20, 10))[:, :5]
    expected = da.broadcast_to(x[:5], (20, 5))
    assert result.expr.simplify()._name == expected.expr.simplify()._name


def test_slice_through_broadcast_to_both_dims():
    x = da.ones((10,), chunks=5)
    result = da.broadcast_to(x, (20, 10))[:5, :3]
    expected = da.broadcast_to(x[:3], (5, 3))
    assert result.expr.simplify()._name == expected.expr.simplify()._name


def test_slice_through_broadcast_to_correctness():
    x = np.arange(10)
    da_x = da.from_array(x, chunks=5)
    assert_eq(da.broadcast_to(da_x, (20, 10))[:5, :3], np.broadcast_to(x, (20, 10))[:5, :3])


def test_slice_through_broadcast_to_reduces_tasks():
    x = da.ones((100,), chunks=10)
    broadcasted = da.broadcast_to(x, (100, 100))
    assert len(dict(broadcasted[:5, :5].optimize().dask)) < len(
        dict(broadcasted.optimize().dask)
    )


# ---------------------------------------------------------------------------
# shuffle (Take) through elemwise / transpose / stack / blockwise
# ---------------------------------------------------------------------------


def test_shuffle_pushes_through_elemwise_add():
    x = da.arange(20, chunks=5)
    y = da.arange(20, chunks=5)
    indices = [1, 3, 5, 7, 9]
    result = (x + y)[indices]
    expected = x[indices] + y[indices]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, (np.arange(20) + np.arange(20))[indices])


def test_shuffle_pushes_through_elemwise_mul():
    x = da.arange(30, chunks=10)
    y = da.arange(30, chunks=10)
    indices = [2, 4, 6, 8]
    result = (x * y)[indices]
    expected = x[indices] * y[indices]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, expected)


def test_shuffle_pushes_through_elemwise_2d():
    x = da.ones((10, 8), chunks=(5, 4))
    y = da.ones((10, 8), chunks=(5, 4))
    indices = [0, 2, 4, 6]
    result = (x + y)[indices, :]
    expected = x[indices, :] + y[indices, :]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, expected)


def test_shuffle_pushes_through_elemwise_scalar():
    x = da.arange(20, chunks=5)
    indices = [1, 5, 9, 13]
    result = (x + 1)[indices]
    expected = x[indices] + 1
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, expected)


def test_shuffle_pushes_through_unary_elemwise():
    x = da.arange(20, chunks=5)
    indices = [2, 4, 6, 8]
    result = (-x)[indices]
    expected = -(x[indices])
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, expected)


def test_shuffle_through_elemwise_reduces_work():
    x = da.ones((100,), chunks=10)
    y = da.ones((100,), chunks=10)
    indices = list(range(0, 100, 10))
    result = (x + y)[indices]
    assert len(dict(result.optimize().dask)) <= len(dict(result.dask))
    assert_eq(result, np.full(10, 2.0))


def test_shuffle_through_elemwise_with_broadcast_2d():
    a = da.from_array(np.arange(200).reshape(10, 20), chunks=(4, 5))
    y2d = da.from_array(np.arange(20).reshape(1, 20), chunks=(1, 20))
    result = (a * y2d)[[5]]
    expected = a[[5]] * y2d
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, expected)


def test_shuffle_through_elemwise_with_broadcast_1d():
    a = da.from_array(np.arange(200).reshape(10, 20), chunks=(4, 5))
    y1d = da.from_array(np.arange(20), chunks=20)
    result = (a * y1d)[[5]]
    expected = a[[5]] * y1d
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, expected)


def test_shuffle_pushes_through_transpose_axis1():
    x = da.arange(20, chunks=5).reshape((4, 5))
    indices = [0, 2]
    result = x.T[:, indices]
    expected = x[indices, :].T
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, expected)


def test_shuffle_pushes_through_transpose_3d():
    x = da.ones((2, 3, 4), chunks=2)
    indices = [0, 2]
    result = x.transpose((2, 1, 0))[indices, :, :]
    expected = x[:, :, indices].transpose((2, 1, 0))
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, expected)


def test_shuffle_pushes_through_stack():
    a = da.arange(12, chunks=4).reshape((3, 4))
    b = da.arange(12, 24, chunks=4).reshape((3, 4))
    stacked = da.stack([a, b], axis=0)
    indices = [0, 2]
    result = stacked[:, indices, :]
    expected = da.stack([a[indices, :], b[indices, :]], axis=0)
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, expected)


def test_shuffle_pushes_through_blockwise():
    x = da.ones((4, 6), chunks=(2, 3))
    mapped = x.map_blocks(lambda b: b * 2)
    indices = [0, 2]
    result = mapped[indices, :]
    opt = result.expr.simplify()
    assert isinstance(opt, Blockwise)
    assert_eq(result, x[indices, :].map_blocks(lambda b: b * 2))


def test_shuffle_does_not_push_through_blockwise_adjust_chunks():
    from dask_array_tpu.ops._fancy_indexing import Take

    x = da.ones((8, 6), chunks=(2, 3))
    mapped = x.map_blocks(lambda b: b * 2, chunks=(1, 3))
    indices = [0, 2]
    result = mapped[indices, :]
    opt = result.expr.simplify()
    assert isinstance(opt, Take)
    assert_eq(result, mapped.compute()[indices, :])


def test_shuffle_not_pushed_into_shared_node():
    x = da.from_array(np.arange(10000.0).reshape(100, 100), chunks=(10, 10))
    y = (x + 1) * 2
    z = y[[5, 3, 1]].sum() + y.sum()
    simplified = z.expr.simplify()
    elemwise_nodes = [n for n in _walk(simplified).values() if isinstance(n, Elemwise)]
    # add + mul of the shared chain, plus the top-level add of the two sums;
    # a duplicated chain would show five
    assert len(elemwise_nodes) == 3

    xn = np.arange(10000.0).reshape(100, 100)
    yn = (xn + 1) * 2
    assert_eq(z, yn[[5, 3, 1]].sum() + yn.sum())
