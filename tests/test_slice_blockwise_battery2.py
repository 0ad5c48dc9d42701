"""Slice-through-blockwise battery, second tranche.

Ports the remaining case mass of the reference's
``tests/test_slice_through_blockwise.py`` (678 LoC): broadcast operand
mapping, shuffle-axis interplay, new_axes/drop_axis/adjust_chunks gating,
multi-input mapping, reduction/tensordot structure, and the regression
corners (size-1 dims, empty slices, out-of-bounds integer on broadcast
dims).  Structure is asserted by simplified-name equality (the reference's
own idiom) or leaf-window shrinkage; values against numpy.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._slicing import Slice
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.ops._from_array import FromArray


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def leaf_elems(expr):
    total = 0
    for n in expr.walk():
        if isinstance(n, FromArray):
            total += int(np.prod([sum(c) for c in n.chunks]))
    return total


# -- broadcast operand mapping (reference :79-163) -----------------------------


def test_slice_through_broadcast_row(rng):
    arr = rng.standard_normal((10, 10))
    row = rng.standard_normal(10)
    x = da.from_array(arr, chunks=(5, 5))
    r = da.from_array(row, chunks=5)
    result = (x + r)[:3, :4]
    expected = x[:3, :4] + r[:4]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, arr[:3, :4] + row[:4])


def test_slice_through_broadcast_column(rng):
    arr = rng.standard_normal((10, 10))
    col = rng.standard_normal((10, 1))
    x = da.from_array(arr, chunks=(5, 5))
    c = da.from_array(col, chunks=(5, 1))
    result = (x + c)[:3, :4]
    expected = x[:3, :4] + c[:3, :]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, arr[:3, :4] + col[:3, :])


def test_slice_through_broadcast_scalar(rng):
    arr = rng.standard_normal((10, 10))
    x = da.from_array(arr, chunks=(5, 5))
    result = (x + 5)[:3, :4]
    expected = x[:3, :4] + 5
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, arr[:3, :4] + 5)


def test_slice_through_broadcast_size_one_dims(rng):
    a_np = rng.standard_normal((1, 20, 1))
    b_np = rng.standard_normal((1, 1, 30))
    a = da.from_array(a_np, chunks=(1, 10, 1))
    b = da.from_array(b_np, chunks=(1, 1, 15))
    result = a + b
    assert result.shape == (1, 20, 30)
    sliced = result[:, 5:10, 10:20]
    assert sliced.shape == (1, 5, 10)
    assert sliced.expr.simplify() is not None
    assert_eq(sliced, (a_np + b_np)[:, 5:10, 10:20])


def test_slice_through_where_with_broadcast():
    cond = (
        da.ones((10, 1, 1), dtype=bool, chunks=(5, 1, 1))
        & da.ones((1, 20, 1), dtype=bool, chunks=(1, 10, 1))
        & da.ones((1, 1, 30), dtype=bool, chunks=(1, 1, 15))
    )
    result = da.where(cond, da.ones((10, 20, 30), chunks=(5, 10, 15)), np.nan)
    sliced = result[:, 5:15, 10:25]
    sliced.expr.simplify()
    assert_eq(sliced, np.ones((10, 10, 15)))


# -- shuffle-axis interplay (reference :185-246) --------------------------------


def test_slice_through_shuffle_non_shuffle_axis(rng):
    arr = rng.standard_normal((20, 10, 12))
    x = da.from_array(arr, chunks=(1, 5, 6))
    indices = list(range(10)) + list(range(19, 9, -1))
    shuffled = x[indices, :, :]
    result = shuffled[:, 2:8, 3:9]
    expected = x[:, 2:8, 3:9][indices, :, :]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, arr[indices, :, :][:, 2:8, 3:9])


def test_slice_through_grouped_shuffle_on_shuffle_axis(rng):
    arr = rng.standard_normal(8)
    x = da.from_array(arr, chunks=4)
    indexer = np.array([6, 5, 2, 4, 1, 3, 0, 7])
    result = x[indexer][1:4]
    assert_eq(result, arr[indexer][1:4])
    assert_eq(da.Array(result.expr.optimize()), arr[indexer][1:4])


def test_slice_on_shuffle_axis_correct(rng):
    # the xarray-unstack shape: identity-grouped shuffle then a head slice
    arr = rng.standard_normal((20, 6))
    x = da.from_array(arr, chunks=(1, 3))
    sh = x.shuffle([[i] for i in range(20)], axis=0)
    result = sh[5:11, :]
    assert_eq(result, arr[5:11, :])
    assert_eq(da.Array(result.expr.optimize()), arr[5:11, :])


# -- new_axes / drop_axis / adjust_chunks gates (reference :247-375) -----------


def test_slice_new_axis_not_pushed(rng):
    arr = rng.standard_normal((10, 10))
    x = da.from_array(arr, chunks=(5, 5))
    y = da.map_blocks(lambda b: b[..., np.newaxis], x, new_axis=2, dtype=arr.dtype)
    assert_eq(y[:3, :4, :], arr[:3, :4, np.newaxis])


def test_slice_symbolic_new_axis_via_blockwise(rng):
    x_np = np.arange(6.0)
    x = da.from_array(x_np, chunks=3)
    y = da.blockwise(
        lambda block: np.broadcast_to(block[:, None], (block.shape[0], 5)).copy(),
        "az",
        x,
        "a",
        new_axes={"z": 5},
        dtype=x.dtype,
    )
    result = y[:, :2]
    expected = np.broadcast_to(x_np[:, None], (6, 5))[:, :2]
    assert_eq(result, expected)
    assert_eq(da.Array(result.expr.optimize()), expected)


def test_slice_only_new_axis(rng):
    arr = rng.standard_normal((10, 10))
    x = da.from_array(arr, chunks=(5, 5))
    y = da.map_blocks(
        lambda b: np.repeat(b[..., np.newaxis], 3, axis=2),
        x,
        new_axis=2,
        chunks=(5, 5, 3),
        dtype=arr.dtype,
    )
    assert_eq(y[:, :, :2], np.repeat(arr[..., np.newaxis], 3, axis=2)[:, :, :2])


def test_slice_through_drop_axis(rng):
    arr = rng.standard_normal((10, 10))
    x = da.from_array(arr, chunks=(5, 5))
    y = da.map_blocks(lambda b: b.sum(axis=0), x, drop_axis=0, dtype=arr.dtype)
    assert_eq(y[:5], arr.sum(axis=0)[:5])


def test_slice_through_drop_axis_1(rng):
    arr = rng.standard_normal((10, 10))
    x = da.from_array(arr, chunks=(5, 5))
    y = da.map_blocks(lambda b: b.sum(axis=1), x, drop_axis=1, dtype=arr.dtype)
    assert_eq(y[:5], arr.sum(axis=1)[:5])


def test_slice_adjust_chunks(rng):
    arr = rng.standard_normal((10, 10))
    x = da.from_array(arr, chunks=(5, 5))
    y = da.map_blocks(
        lambda b: np.repeat(b, 2, axis=0), x, chunks=(10, 5), dtype=arr.dtype
    )
    assert y.shape == (20, 10)
    assert_eq(y[:5, :5], np.repeat(arr, 2, axis=0)[:5, :5])


# -- multi-input mapping (reference :376-412) ----------------------------------


def test_slice_multiple_inputs_same_shape(rng):
    arr1 = rng.standard_normal((10, 10))
    arr2 = rng.standard_normal((10, 10))
    x = da.from_array(arr1, chunks=(5, 5))
    y = da.from_array(arr2, chunks=(5, 5))
    result = (x + y)[:3, :4]
    expected = x[:3, :4] + y[:3, :4]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, arr1[:3, :4] + arr2[:3, :4])


def test_slice_multiple_inputs_broadcast(rng):
    arr = rng.standard_normal((10, 10))
    vec = rng.standard_normal(10)
    x = da.from_array(arr, chunks=(5, 5))
    v = da.from_array(vec, chunks=5)
    result = (x * v)[:3, :4]
    expected = x[:3, :4] * v[:4]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, arr[:3, :4] * vec[:4])


# -- reduction structure (reference :446-517) -----------------------------------


def test_optimization_applied_to_reduction(rng):
    from dask_array_tpu.ops.reductions import Reduction

    x = da.from_array(rng.standard_normal((100, 100)), chunks=(10, 10))
    y = x.sum(axis=0)[:5]
    assert isinstance(y.expr, Slice)
    simplified = y.expr.simplify()
    assert not isinstance(simplified, Slice)
    assert any(isinstance(n, Reduction) for n in simplified.walk())
    # the leaf window shrank to one column band
    assert leaf_elems(simplified) == 100 * 5


def test_optimization_pushes_through_new_axes_when_safe(rng):
    arr = rng.standard_normal((20, 20))
    x = da.from_array(arr, chunks=(5, 5))
    y = da.map_blocks(lambda b: b[..., np.newaxis], x, new_axis=2, dtype=float)
    z = y[:5, :5, :]
    assert_eq(z, arr[:5, :5, np.newaxis])


def test_optimization_reduces_leaf_window(rng):
    arr = rng.standard_normal((100, 100))
    x = da.from_array(arr, chunks=(10, 10))
    full = x.sum(axis=0).expr.optimize()
    sliced = x.sum(axis=0)[:5].expr.optimize()
    assert leaf_elems(sliced) < leaf_elems(full) / 5


# -- tensordot / matmul (reference :519-584) ------------------------------------


def test_slice_through_tensordot_correctness(rng):
    arr = rng.standard_normal((100, 100))
    x = da.from_array(arr, chunks=(10, 10))
    assert_eq(x.dot(x.T)[:5, :5], arr.dot(arr.T)[:5, :5])


def test_slice_through_matmul_correctness(rng):
    arr1 = rng.standard_normal((100, 50))
    arr2 = rng.standard_normal((50, 100))
    x = da.from_array(arr1, chunks=(10, 10))
    y = da.from_array(arr2, chunks=(10, 10))
    assert_eq((x @ y)[:5, :5], (arr1 @ arr2)[:5, :5])


def test_slice_through_matmul_expression_structure():
    x = da.ones((100, 50), chunks=(10, 10))
    y = da.ones((50, 100), chunks=(10, 10))
    result = (x @ y)[:15, :25]
    expected = x[:15, :] @ y[:, :25]
    assert result.expr.simplify()._name == expected.expr.simplify()._name


def test_slice_through_tensordot_shrinks_leaves(rng):
    arr = rng.standard_normal((100, 100))
    x = da.from_array(arr, chunks=(10, 10))
    full = x.dot(x.T).expr.optimize()
    sliced = x.dot(x.T)[:5, :5].expr.optimize()
    assert leaf_elems(sliced) < leaf_elems(full)


# -- regression corners (reference :586-664) -------------------------------------


def test_integer_index_on_size_one_dim_through_elemwise(rng):
    arr = rng.standard_normal((8, 9, 10))
    x = da.from_array(arr, chunks=(8, 9, 10))
    shuffled = da.shuffle(x, [[0]], axis=2)  # -> (8, 9, 1)
    cond = da.from_array(np.array([True]), chunks=(1,))
    elemwise = da.where(cond, shuffled, np.nan)
    indexed = elemwise[:, :, 0]
    assert indexed.shape == (8, 9)
    assert indexed.compute().shape == (8, 9)
    assert_eq(indexed, arr[:, :, 0])


def test_integer_index_through_elemwise_broadcast():
    x = da.ones((10, 1, 20), chunks=(5, 1, 10))
    y = da.ones((10, 15, 20), chunks=(5, 5, 10))
    result = (x + y)[:, :, 0]
    assert result.shape == (10, 15)
    assert_eq(result, np.full((10, 15), 2.0))


def test_empty_slice_through_elemwise_broadcast():
    scalar_da = da.from_array(np.float32(0.0), chunks=-1)
    arr_da = da.from_array(np.array([[0.0]], dtype="float32"), chunks=-1)
    added = scalar_da + arr_da
    assert added.shape == (1, 1)
    result = added[0, :0]
    assert result.shape == (0,)
    assert result.compute().shape == (0,)


def test_integer_index_out_of_bounds_on_broadcast_dim():
    scalar = da.from_array(np.float32(0.0), chunks=-1)
    arr1 = da.from_array(np.array([[0.0, 1.0]], dtype="float32"), chunks=-1)
    arr2 = da.from_array(np.zeros((1, 1, 1, 1), dtype="float32"), chunks=-1)
    result = scalar + arr1 + arr2
    assert result.shape == (1, 1, 1, 2)
    indexed = result[0, 0, 0, 1]
    assert indexed.shape == ()
    assert float(indexed.compute()) == 1.0


def test_empty_slice_not_pushed_through_reduction():
    arr = da.from_array(np.zeros((1, 2, 1, 1), dtype="float32"), chunks=-1)
    reduced = da.nanmin(arr, axis=(1, 2, 3))
    sliced = reduced[:-1]
    assert sliced.shape == (0,)
    assert sliced.compute().shape == (0,)
