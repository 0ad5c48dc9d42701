"""Coarse (block-culling) slice pushdown through blockwise.

Ports the CASES of the reference's ``test_coarse_slice_through_blockwise.py``
(362 LoC, 11 tests): when ``adjust_chunks``/``chunks=`` changes per-block
sizes, an exact slice cannot push — but output block i still comes from
input block i, so whole blocks cull (inputs take a block-aligned cut, a
residual slice trims outside).  The repo's task-reduction analog is the
LEAF WINDOW: the FromArray reads must shrink to the kept blocks.

Also pins the coordinate-reading guard: funcs taking ``block_id``/
``block_info`` must never have blocks culled beneath them (culling
renumbers coordinates) — a live bug found while porting this battery.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._slicing import Slice
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.ops._from_array import FromArray


def leaf_chunks(expr):
    return [n.chunks for n in expr.walk() if isinstance(n, FromArray)]


def _double(block):
    return np.repeat(np.asarray(block), 2)


@pytest.fixture
def mapped():
    arr = np.arange(100)
    x = da.from_array(arr, chunks=10)
    y = da.map_blocks(_double, x, chunks=(20,), dtype=arr.dtype)
    return arr, x, y


def test_coarse_slice_simple(mapped):
    # y[:20] needs output block 0 only -> input block 0 only; exactly the
    # plan map_blocks(double, x[:10]) builds (reference asserts name parity)
    arr, x, y = mapped
    result = y[:20]
    expected = da.map_blocks(_double, x[:10], chunks=(20,), dtype=arr.dtype)
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert leaf_chunks(result.expr.simplify()) == [((10,),)]
    assert_eq(result, np.repeat(arr, 2)[:20])


def test_coarse_slice_middle_blocks(mapped):
    arr, x, y = mapped
    result = y[40:80]
    expected = da.map_blocks(_double, x[20:40], chunks=((20, 20),), dtype=arr.dtype)
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, np.repeat(arr, 2)[40:80])


def test_coarse_slice_partial_block(mapped):
    # y[30:50] spans parts of blocks 1-2: cull to blocks 1-2, trim [10:30]
    arr, x, y = mapped
    result = y[30:50]
    expected = da.map_blocks(_double, x[10:30], chunks=((20, 20),), dtype=arr.dtype)[10:30]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert leaf_chunks(result.expr.simplify()) == [((10, 10),)]
    assert_eq(result, np.repeat(arr, 2)[30:50])


def test_coarse_slice_2d_adjusted_axis():
    arr = np.arange(100).reshape(10, 10)
    x = da.from_array(arr, chunks=(5, 5))

    def double_rows(block):
        return np.repeat(np.asarray(block), 2, axis=0)

    y = da.map_blocks(double_rows, x, chunks=(10, 5), dtype=arr.dtype)
    result = y[:10, :]
    expected = da.map_blocks(double_rows, x[:5, :], chunks=(10, 5), dtype=arr.dtype)
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert leaf_chunks(result.expr.simplify()) == [((5,), (5, 5))]
    assert_eq(result, np.repeat(arr, 2, axis=0)[:10, :])


def test_coarse_optimization_shrinks_leaf_window():
    # the repo analog of the reference's task-count reduction: a 10% slice
    # reads 10% of the source
    arr = np.arange(1000)
    x = da.from_array(arr, chunks=10)
    y = da.map_blocks(_double, x, chunks=(20,), dtype=arr.dtype)
    sliced = y[:200]
    leafs = leaf_chunks(sliced.expr.simplify())
    assert leafs == [((10,) * 10,)]  # 100 elements of 1000


def test_coarse_slice_multi_input():
    arr1 = np.arange(100)
    arr2 = np.arange(100, 200)
    x = da.from_array(arr1, chunks=10)
    y = da.from_array(arr2, chunks=10)

    def combine_double(a, b):
        return np.repeat(np.asarray(a) + np.asarray(b), 2)

    z = da.blockwise(
        combine_double, "i", x, "i", y, "i",
        dtype=arr1.dtype, adjust_chunks={"i": lambda c: c * 2},
    )
    result = z[:20]
    assert_eq(result, np.repeat(arr1 + arr2, 2)[:20])
    assert leaf_chunks(result.expr.simplify()) == [((10,),), ((10,),)]


def test_coarse_slice_correctness_various(mapped):
    arr, _, y = mapped
    expected_full = np.repeat(arr, 2)
    for slc in [
        slice(0, 20),
        slice(20, 60),
        slice(180, 200),
        slice(15, 45),
        slice(0, 100),
        slice(100, 200),
        slice(7, 13),
        slice(195, 200),
        slice(0, 200),
        slice(5, 5),
    ]:
        assert_eq(y[slc], expected_full[slc])


def test_coarse_slice_with_broadcast():
    arr = np.arange(100).reshape(10, 10)
    vec = np.arange(10)
    x = da.from_array(arr, chunks=(5, 5))
    v = da.from_array(vec, chunks=5)

    def double_rows(a, b):
        return np.repeat(np.asarray(a) * np.asarray(b), 2, axis=0)

    z = da.blockwise(
        double_rows, "ij", x, "ij", v, "j",
        dtype=arr.dtype, adjust_chunks={"i": lambda c: c * 2},
    )
    assert z.shape == (20, 10)
    result = z[:10, :]
    assert_eq(result, np.repeat(arr * vec, 2, axis=0)[:10, :])
    # only the 2-D input culls rows; the 1-D broadcast arg keeps both blocks
    leafs = sorted(leaf_chunks(result.expr.simplify()))
    assert ((5,), (5, 5)) in leafs


def test_coarse_slice_dimension_reorder():
    # blockwise transposing indices (ij -> ji): output block (i, j) comes
    # from input block (j, i); the cull maps through the label, not position
    arr = np.arange(100).reshape(10, 10)
    x = da.from_array(arr, chunks=(5, 5))

    def transpose_double(block):
        return np.repeat(np.asarray(block).T, 2, axis=0)

    z = da.blockwise(
        transpose_double, "ji", x, "ij",
        dtype=arr.dtype, adjust_chunks={"j": lambda c: c * 2},
    )
    assert z.shape == (20, 10)
    expected_full = np.repeat(arr.T, 2, axis=0)
    for slc in [(slice(None, 10), slice(None)), (slice(None, 10), slice(None, 5))]:
        assert_eq(z[slc], expected_full[slc])
    assert leaf_chunks(z[:10, :5].expr.simplify()) == [((5,), (5,))]


def test_coarse_slice_tuple_adjust_chunks():
    # tuple adjust_chunks narrows with the kept blocks
    arr = np.arange(30)
    x = da.from_array(arr, chunks=10)

    def shrink_first(block):
        return np.asarray(block)[:5]

    y = da.blockwise(
        shrink_first, "i", x, "i", dtype=arr.dtype, adjust_chunks={"i": (5, 5, 5)}
    )
    assert y.chunks == ((5, 5, 5),)
    result = y[5:]
    assert result.chunks == ((5, 5),)
    assert_eq(result, np.concatenate([arr[10:15], arr[20:25]]))
    assert leaf_chunks(result.expr.simplify()) == [((10, 10),)]


def test_coarse_slice_irregular_chunks():
    arr = np.arange(100)
    x = da.from_array(arr, chunks=10)

    def expand_variable(block):
        block = np.asarray(block)
        return np.repeat(block, 2) if block[0] % 20 == 0 else np.repeat(block, 3)

    output_chunks = tuple(20 if i % 2 == 0 else 30 for i in range(10))
    y = da.blockwise(
        expand_variable, "i", x, "i", dtype=arr.dtype,
        adjust_chunks={"i": output_chunks},
    )
    assert y.chunks == (output_chunks,)
    result = y[20:70]
    expected = np.concatenate([np.repeat(arr[10:20], 3), np.repeat(arr[20:30], 2)])
    assert_eq(result, expected)
    assert leaf_chunks(result.expr.simplify()) == [((10, 10),)]


def test_coarse_residual_does_not_rewrite_forever(mapped):
    # the residual slice covers every kept block, so a second pushdown pass
    # declines — the rewrite is contracting (no simplify-divergence warning)
    import warnings

    arr, _, y = mapped
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        opt = y[15:45].expr.simplify()
    assert isinstance(opt, Slice)
    assert_eq(y[15:45], np.repeat(arr, 2)[15:45])


# -- coordinate-reading funcs must not be culled beneath (regression) ----------


def test_block_id_func_slice_stays_above():
    arr = np.arange(100.0)
    x = da.from_array(arr, chunks=10)

    def f(block, block_id=None):
        return np.asarray(block) + 1000 * block_id[0]

    y = da.map_blocks(f, x, dtype="f8")
    want = np.concatenate([arr[i * 10 : (i + 1) * 10] + 1000 * i for i in range(10)])
    for slc in [slice(20, 40), slice(0, 10), slice(5, 95), slice(90, 100)]:
        assert_eq(y[slc], want[slc])
    # structurally: the leaf keeps its full window (nothing culled beneath)
    assert leaf_chunks(y[20:40].expr.simplify()) == [((10,) * 10,)]


def test_block_info_func_slice_stays_above():
    arr = np.arange(100.0)
    x = da.from_array(arr, chunks=10)

    def g(block, block_info=None):
        lo = block_info[None]["array-location"][0][0]
        return np.asarray(block) + lo

    y = da.map_blocks(g, x, dtype="f8")
    want = np.concatenate([arr[i * 10 : (i + 1) * 10] + i * 10 for i in range(10)])
    for slc in [slice(30, 50), slice(0, 100)]:
        assert_eq(y[slc], want[slc])


def test_block_id_with_chunks_override_slice_stays_above():
    # ChunksOverride's coarse cull must decline when the inner func reads
    # block_id: the cut is only sound if the inner absorbs it, which the
    # with-id guard prevents
    arr = np.arange(100.0)
    x = da.from_array(arr, chunks=10)

    def h(block, block_id=None):
        return np.repeat(np.asarray(block), 2) + 1000 * block_id[0]

    y = da.map_blocks(h, x, chunks=(20,), dtype="f8")
    want = np.concatenate(
        [np.repeat(arr[i * 10 : (i + 1) * 10], 2) + 1000 * i for i in range(10)]
    )
    for slc in [slice(30, 50), slice(0, 20), slice(15, 45), slice(180, 200)]:
        assert_eq(y[slc], want[slc])
    assert leaf_chunks(y[30:50].expr.simplify()) == [((10,) * 10,)]
