"""Slice pushdown structural battery.

Ports the CASES of the reference's ``tests/test_slice_pushdown.py`` (1235
LoC, 80 tests) to this architecture: structure asserted on simplified
trees (node types + leaf windows — the analog of the reference's
simplified-name/task-count assertions), values against numpy.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._slicing import Slice
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.ops._from_array import FromArray
from dask_array_tpu.ops.creation import BroadcastTrick, Full, Ones, Zeros
from dask_array_tpu.ops.reductions import Reduction


@pytest.fixture
def rng():
    return np.random.default_rng(41)


def types_of(expr):
    return [type(n).__name__ for n in expr.walk()]


def leaf_chunks(expr, cls=FromArray):
    return [n.chunks for n in expr.walk() if isinstance(n, cls)]


def n_slices(expr):
    return sum(1 for n in expr.walk() if isinstance(n, Slice))


# ---------------------------------------------------------------------------
# correctness grid (parity: test_slice_correctness / test_task_count)
# ---------------------------------------------------------------------------

_GRID = [
    ((20,), 5, np.s_[3:17]),
    ((20,), 5, np.s_[::2]),
    ((20,), 5, np.s_[::-1]),
    ((20,), 5, np.s_[17:3:-2]),
    ((20,), 5, np.s_[0:0]),
    ((20,), (3, 7, 5, 5), np.s_[4:16]),
    ((12, 10), (4, 5), np.s_[2:10, 1:9]),
    ((12, 10), (4, 5), np.s_[::3, ::-2]),
    ((12, 10), (4, 5), np.s_[5]),
    ((12, 10), (4, 5), np.s_[:, 7]),
    ((12, 10), (4, 5), np.s_[None, 3:9]),
    ((12, 10), (4, 5), np.s_[..., 2]),
    ((6, 5, 4), 2, np.s_[1:5, ::2, ::-1]),
    ((6, 5, 4), 2, np.s_[3, :, 1:3]),
]


@pytest.mark.parametrize("shape,chunks,slc", _GRID)
def test_slice_correctness(rng, shape, chunks, slc):
    x = rng.standard_normal(shape)
    d = da.from_array(x, chunks=chunks)
    assert_eq(d[slc], x[slc])


@pytest.mark.parametrize("shape,chunks,slc", _GRID)
def test_slice_through_elemwise_correctness(rng, shape, chunks, slc):
    x = rng.standard_normal(shape)
    d = da.from_array(x, chunks=chunks)
    assert_eq((d + 1)[slc], (x + 1)[slc])


# ---------------------------------------------------------------------------
# slice o slice fusion (parity: test_slice_optimize_slice / nested_slices)
# ---------------------------------------------------------------------------


def test_slice_of_slice_fuses(rng):
    x = rng.standard_normal((40,))
    d = da.from_array(x, chunks=10)
    y = d[2:38][3:30][::2]
    opt = y.expr.simplify()
    assert n_slices(opt) <= 1, opt.tree_repr()
    assert_eq(y, x[2:38][3:30][::2])


def test_nested_slices_many_layers(rng):
    x = rng.standard_normal((64, 8))
    d = da.from_array(x, chunks=(8, 8))
    y = d[1:][1:][1:][1:]
    opt = y.expr.simplify()
    assert n_slices(opt) <= 1
    assert_eq(y, x[4:])


def test_deterministic_names(rng):
    x = rng.standard_normal((16,))
    a = da.from_array(x, chunks=4)[2:12].expr.simplify()
    b = da.from_array(x, chunks=4)[2:12].expr.simplify()
    assert a._name == b._name  # content-addressed determinism


# ---------------------------------------------------------------------------
# slice into FromArray (region deferral + culling)
# ---------------------------------------------------------------------------


def test_slice_pushes_into_from_array(rng):
    x = rng.standard_normal((40, 40))
    d = da.from_array(x, chunks=10)
    y = (d[:10, :10] * 2).expr.simplify()
    lcs = leaf_chunks(y)
    assert lcs and lcs[0] == ((10,), (10,)), y.tree_repr()


def test_full_slice_is_identity(rng):
    x = rng.standard_normal((10, 10))
    d = da.from_array(x, chunks=5)
    y = d[:, :]
    assert y.expr.simplify()._name == d.expr._name


def test_slice_stays_above_computed_reduction_root(rng):
    # slicing a node whose values are computed (cumsum) keeps correctness;
    # the slice must not corrupt the computed values
    x = rng.standard_normal((20, 8))
    d = da.from_array(x, chunks=(5, 8))
    y = d.cumsum(axis=0)[3:17]
    assert_eq(y, np.cumsum(x, axis=0)[3:17])


def test_shared_dependent_declines_push(rng):
    # the child has a non-slice consumer: the push must decline (no
    # duplicated reads), values stay right
    x = rng.standard_normal((24,))
    d = da.from_array(x, chunks=6) * 3
    a = d[:6]
    b = d.sum()
    out = a + b
    opt = out.expr.simplify()
    assert_eq(out, (x * 3)[:6] + (x * 3).sum())


# ---------------------------------------------------------------------------
# slice through creation (parity: test_slice_ones/zeros/full/...)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "maker,cls",
    [
        (lambda: da.ones((20, 20), chunks=5), Ones),
        (lambda: da.zeros((20, 20), chunks=5), Zeros),
        (lambda: da.full((20, 20), 7.5, chunks=5), Full),
    ],
)
def test_slice_creation_returns_smaller_creation(maker, cls):
    d = maker()
    y = d[2:12, :5]
    opt = y.expr.simplify()
    assert isinstance(opt, BroadcastTrick), opt.tree_repr()
    assert opt.shape == (10, 5)


def test_slice_creation_preserves_dtype():
    d = da.ones((12, 12), chunks=4, dtype="f4")
    y = d[:3, :3]
    assert y.dtype == np.dtype("f4")
    assert_eq(y, np.ones((3, 3), dtype="f4"))


def test_slice_creation_correctness():
    assert_eq(da.full((9, 9), 3, chunks=3)[1:8, ::2], np.full((9, 9), 3)[1:8, ::2])


def test_broadcast_to_empty_slice():
    d = da.broadcast_to(da.ones((4,), chunks=2), (3, 4))
    y = d[0:0]
    assert y.shape == (0, 4)
    assert np.asarray(y.compute()).shape == (0, 4)


# ---------------------------------------------------------------------------
# slice through concatenate / stack (parity: test_slice_through_concat_*)
# ---------------------------------------------------------------------------


def test_slice_through_concat_same_axis_first_array(rng):
    x = rng.standard_normal((10, 4))
    y = rng.standard_normal((6, 4))
    dx, dy = da.from_array(x, chunks=5), da.from_array(y, chunks=3)
    c = da.concatenate([dx, dy], axis=0)
    s = c[:8]
    opt = s.expr.simplify()
    # entirely inside the first part: the second part must be culled
    leaves = leaf_chunks(opt)
    assert all(sum(lc[0]) <= 10 for lc in leaves), opt.tree_repr()
    assert_eq(s, np.concatenate([x, y])[:8])


def test_slice_through_concat_spans_arrays(rng):
    x = rng.standard_normal((10, 4))
    y = rng.standard_normal((6, 4))
    c = da.concatenate([da.from_array(x, chunks=5), da.from_array(y, chunks=3)], axis=0)
    s = c[6:14]
    assert_eq(s, np.concatenate([x, y])[6:14])


def test_slice_through_concat_different_axis(rng):
    x = rng.standard_normal((6, 8))
    y = rng.standard_normal((6, 8))
    c = da.concatenate([da.from_array(x, chunks=3), da.from_array(y, chunks=3)], axis=0)
    s = c[:, 2:6]
    opt = s.expr.simplify()
    # the column slice distributes into both parts
    assert all(lc[1] in (((4,),), ((4,),)) or sum(lc[1]) == 4 for lc in leaf_chunks(opt)), opt.tree_repr()
    assert_eq(s, np.concatenate([x, y])[:, 2:6])


def test_slice_through_stack_selects_subset(rng):
    xs = [rng.standard_normal((4, 4)) for _ in range(5)]
    ds = [da.from_array(x, chunks=2) for x in xs]
    st = da.stack(ds, axis=0)
    s = st[1:3]
    opt = s.expr.simplify()
    assert len(leaf_chunks(opt)) <= 2, opt.tree_repr()  # culled to 2 parts
    assert_eq(s, np.stack(xs)[1:3])


def test_slice_through_stack_other_axis(rng):
    xs = [rng.standard_normal((4, 6)) for _ in range(3)]
    st = da.stack([da.from_array(x, chunks=2) for x in xs], axis=0)
    assert_eq(st[:, 1:3, ::2], np.stack(xs)[:, 1:3, ::2])


def test_slice_through_stack_integer_selects_one(rng):
    xs = [rng.standard_normal((4, 4)) for _ in range(4)]
    st = da.stack([da.from_array(x, chunks=2) for x in xs], axis=0)
    s = st[2]
    opt = s.expr.simplify()
    assert len(leaf_chunks(opt)) == 1, opt.tree_repr()
    assert_eq(s, xs[2])


# ---------------------------------------------------------------------------
# slice through broadcast_to (parity: test_slice_through_broadcast_to_*)
# ---------------------------------------------------------------------------


def test_slice_through_broadcast_new_dim(rng):
    x = rng.standard_normal((6,))
    d = da.broadcast_to(da.from_array(x, chunks=3), (4, 6))
    s = d[1:3]
    opt = s.expr.simplify()
    assert opt.shape == (2, 6)
    assert_eq(s, np.broadcast_to(x, (4, 6))[1:3])


def test_slice_through_broadcast_existing_dim(rng):
    x = rng.standard_normal((6,))
    d = da.broadcast_to(da.from_array(x, chunks=3), (4, 6))
    s = d[:, 2:5]
    opt = s.expr.simplify()
    # the slice reaches the 1-D source
    lcs = leaf_chunks(opt)
    assert lcs and sum(lcs[0][0]) == 3, opt.tree_repr()
    assert_eq(s, np.broadcast_to(x, (4, 6))[:, 2:5])


def test_slice_through_broadcast_both_dims(rng):
    x = rng.standard_normal((6,))
    d = da.broadcast_to(da.from_array(x, chunks=3), (4, 6))
    assert_eq(d[1:3, 2:5], np.broadcast_to(x, (4, 6))[1:3, 2:5])


def test_slice_through_broadcast_size_one_source(rng):
    x = rng.standard_normal((1, 6))
    d = da.broadcast_to(da.from_array(x, chunks=(1, 3)), (5, 6))
    assert_eq(d[2:4, 1:5], np.broadcast_to(x, (5, 6))[2:4, 1:5])


# ---------------------------------------------------------------------------
# slice through reductions (parity: test_slice_through_reduction_*)
# ---------------------------------------------------------------------------


def test_slice_through_reduction_axis0(rng):
    x = rng.standard_normal((40, 40))
    d = da.from_array(x, chunks=10)
    y = d.sum(axis=0)[:10]
    opt = y.expr.simplify()
    red = [n for n in opt.walk() if isinstance(n, Reduction)]
    assert red and red[0].array.shape == (40, 10), opt.tree_repr()
    assert_eq(y, x.sum(axis=0)[:10])


def test_slice_through_reduction_axis1(rng):
    x = rng.standard_normal((40, 40))
    d = da.from_array(x, chunks=10)
    y = d.sum(axis=1)[5:25]
    opt = y.expr.simplify()
    red = [n for n in opt.walk() if isinstance(n, Reduction)]
    assert red and red[0].array.shape == (20, 40), opt.tree_repr()
    assert_eq(y, x.sum(axis=1)[5:25])


def test_slice_through_reduction_3d(rng):
    x = rng.standard_normal((12, 10, 8))
    d = da.from_array(x, chunks=4)
    y = d.sum(axis=1)[2:9, 1:7]
    opt = y.expr.simplify()
    red = [n for n in opt.walk() if isinstance(n, Reduction)]
    assert red and red[0].array.shape == (7, 10, 6), opt.tree_repr()
    assert_eq(y, x.sum(axis=1)[2:9, 1:7])


def test_slice_through_reduction_multiple_axes(rng):
    x = rng.standard_normal((10, 12, 8))
    d = da.from_array(x, chunks=4)
    y = d.sum(axis=(0, 2))[3:9]
    opt = y.expr.simplify()
    red = [n for n in opt.walk() if isinstance(n, Reduction)]
    assert red and red[0].array.shape == (10, 6, 8), opt.tree_repr()
    assert_eq(y, x.sum(axis=(0, 2))[3:9])


def test_slice_through_reduction_integer_index(rng):
    x = rng.standard_normal((20, 16))
    d = da.from_array(x, chunks=4)
    y = d.sum(axis=0)[7]
    opt = y.expr.simplify()
    red = [n for n in opt.walk() if isinstance(n, Reduction)]
    assert red and red[0].array.shape == (20, 1), opt.tree_repr()
    assert_eq(y, x.sum(axis=0)[7])


def test_slice_through_reduction_keepdims(rng):
    x = rng.standard_normal((16, 12))
    d = da.from_array(x, chunks=4)
    y = d.sum(axis=0, keepdims=True)[:, 2:8]
    assert_eq(y, x.sum(axis=0, keepdims=True)[:, 2:8])


def test_slice_of_reduced_axis_stays_outside(rng):
    # slicing WITHIN a keepdims-reduced axis can't push into the input
    x = rng.standard_normal((8, 8))
    d = da.from_array(x, chunks=4)
    y = d.sum(axis=0, keepdims=True)[0:1, :]
    assert_eq(y, x.sum(axis=0, keepdims=True)[0:1, :])


def test_mean_var_slice_pushdown_values(rng):
    x = rng.standard_normal((24, 24))
    d = da.from_array(x, chunks=8)
    assert_eq(d.mean(axis=0)[:6], x.mean(axis=0)[:6])
    assert_eq(d.var(axis=1)[3:20], x.var(axis=1)[3:20])
    assert_eq(d.max(axis=0)[::2], x.max(axis=0)[::2])


# ---------------------------------------------------------------------------
# non-pushdown / edge cases (parity: test_non_pushdown_cases, steps...)
# ---------------------------------------------------------------------------


def test_steps_and_reverse_values(rng):
    x = rng.standard_normal((30,))
    d = da.from_array(x, chunks=7)
    for slc in (np.s_[::2], np.s_[::-1], np.s_[25:3:-3], np.s_[1::4]):
        assert_eq(d[slc], x[slc])


def test_newaxis_not_pushed_but_correct(rng):
    x = rng.standard_normal((10, 6))
    d = da.from_array(x, chunks=(5, 3))
    y = (d * 2)[None, 2:8]
    assert_eq(y, (x * 2)[None, 2:8])


def test_ellipsis_expansion(rng):
    x = rng.standard_normal((4, 5, 6))
    d = da.from_array(x, chunks=2)
    assert_eq(d[..., 1:4], x[..., 1:4])
    assert_eq(d[1, ...], x[1, ...])


def test_empty_slice_result(rng):
    x = rng.standard_normal((10,))
    d = da.from_array(x, chunks=5)
    y = d[4:4]
    assert y.shape == (0,)
    assert np.asarray(y.compute()).shape == (0,)


def test_out_of_bounds_integer_raises(rng):
    d = da.from_array(rng.standard_normal((5,)), chunks=5)
    with pytest.raises(IndexError):
        d[7]


def test_slice_then_reduction(rng):
    x = rng.standard_normal((30, 30))
    d = da.from_array(x, chunks=10)
    y = d[5:25].sum(axis=0)
    opt = y.expr.simplify()
    lcs = leaf_chunks(opt)
    assert lcs and sum(lcs[0][0]) == 20, opt.tree_repr()
    assert_eq(y, x[5:25].sum(axis=0))


def test_masked_leaf_unknown_dims_no_crash(rng):
    # slicing after a mask: metadata unknown, values right (eager path)
    x = rng.standard_normal((12,))
    d = da.from_array(x, chunks=4)
    m = d[da.from_array(x > 0, chunks=4)]
    total = m.sum()
    assert_eq(total, x[x > 0].sum())


def test_slice_on_broadcast_axis_judged_against_output_length(rng):
    # regression (found by bench/diff_adversarial case 42): pushing a slice
    # through an elemwise onto a SIZE-1 broadcast operand evaluated
    # emptiness against the operand length (1), so roll's [17:19] column
    # slice of a length-19 output became slice(0,0) -> trace-time shape
    # mismatch (6,0)+(6,2)
    x = rng.standard_normal((6, 19))
    d = da.from_array(x, chunks=(12, 3))
    ref = x
    d, ref = d.sum(axis=1, keepdims=True) + d, ref.sum(axis=1, keepdims=True) + ref
    d, ref = d.T, ref.T
    d, ref = da.roll(d, 2, axis=0), np.roll(ref, 2, axis=0)
    out = d.sum(axis=0)
    np.testing.assert_allclose(np.asarray(out.compute()), ref.sum(axis=0), rtol=1e-9)
    # genuinely-empty output slices still propagate through broadcast ops
    e = (da.ones((4, 1), chunks=2) + da.ones((4, 7), chunks=2))[:, 3:3]
    assert np.asarray(e.compute()).shape == (4, 0)


# -- round-3 additions: reference slice-through-blockwise spine --------------


def test_slice_through_where_with_broadcast():
    # reference test_slice_through_blockwise.py:164 (xarray regression)
    cond = (
        da.ones((10, 1, 1), dtype=bool, chunks=(5, 1, 1))
        & da.ones((1, 20, 1), dtype=bool, chunks=(1, 10, 1))
        & da.ones((1, 1, 30), dtype=bool, chunks=(1, 1, 15))
    )
    result = da.where(cond, da.ones((10, 20, 30), chunks=(5, 10, 15)), np.nan)
    sliced = result[:, 5:15, 10:25]
    sliced.expr.simplify()  # must not raise
    assert_eq(sliced, np.ones((10, 10, 15)))


def test_slice_through_take_non_take_axis():
    # reference :185 — slices on non-reordered axes commute below a Take
    arr = np.arange(100 * 20 * 12).reshape(100, 20, 12).astype("f8")
    x = da.from_array(arr, chunks=(25, 10, 6))
    indices = list(range(50)) + list(range(99, 49, -1))
    shuffled = x[indices, :, :]
    result = shuffled[:, 10:20, 6:12]
    expected = x[:, 10:20, 6:12][indices, :, :]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, arr[indices][:, 10:20, 6:12])


def test_slice_through_take_on_take_axis_values():
    # a slice ON the reordered axis cannot commute; values must be exact
    arr = np.arange(8.0)
    x = da.from_array(arr, chunks=4)
    indexer = np.array([6, 5, 2, 4, 1, 3, 0, 7])
    result = x[indexer][1:4]
    assert_eq(result, arr[indexer][1:4])


def test_slice_through_drop_axis():
    # reference :309
    arr = np.arange(100).reshape(10, 10)
    x = da.from_array(arr, chunks=(5, 5))
    y = da.map_blocks(lambda b: b.sum(axis=0), x, drop_axis=0, dtype=arr.dtype)
    assert_eq(y[:5], arr.sum(axis=0)[:5])


def test_slice_through_drop_axis_1():
    arr = np.arange(100).reshape(10, 10)
    x = da.from_array(arr, chunks=(5, 5))
    y = da.map_blocks(lambda b: b.sum(axis=1), x, drop_axis=1, dtype=arr.dtype)
    assert_eq(y[:5], arr.sum(axis=1)[:5])


def test_slice_through_adjust_chunks_values():
    # reference :346 — output chunk sizes transformed: pushdown must not
    # forward indices into the input
    arr = np.arange(100).reshape(10, 10)
    x = da.from_array(arr, chunks=(5, 5))
    y = da.map_blocks(
        lambda b: np.repeat(np.asarray(b), 2, axis=0), x, chunks=(10, 5), dtype=arr.dtype
    )
    assert_eq(y[:5, :5], np.repeat(arr, 2, axis=0)[:5, :5])


def test_slice_multiple_inputs_same_shape():
    arr1 = np.arange(100).reshape(10, 10)
    arr2 = np.arange(100, 200).reshape(10, 10)
    x = da.from_array(arr1, chunks=(5, 5))
    y = da.from_array(arr2, chunks=(5, 5))
    result = (x + y)[:3, :4]
    expected = x[:3, :4] + y[:3, :4]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, arr1[:3, :4] + arr2[:3, :4])


def test_slice_multiple_inputs_broadcast():
    arr = np.arange(100).reshape(10, 10)
    vec = np.arange(10)
    x = da.from_array(arr, chunks=(5, 5))
    v = da.from_array(vec, chunks=5)
    result = (x * v)[:3, :4]
    expected = x[:3, :4] * v[:4]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, (arr * vec)[:3, :4])


def test_slice_through_tensordot_correctness():
    # reference :520
    a_np = np.arange(48.0).reshape(6, 8)
    b_np = np.arange(40.0).reshape(8, 5)
    a = da.from_array(a_np, chunks=(3, 4))
    b = da.from_array(b_np, chunks=(4, 5))
    r = da.tensordot(a, b, axes=1)[2:5, 1:4]
    assert_eq(r, (a_np @ b_np)[2:5, 1:4])


def test_slice_through_matmul_correctness():
    a_np = np.arange(48.0).reshape(6, 8)
    b_np = np.arange(40.0).reshape(8, 5)
    a = da.from_array(a_np, chunks=(3, 4))
    b = da.from_array(b_np, chunks=(4, 5))
    r = (a @ b)[1:4, :3]
    assert_eq(r, (a_np @ b_np)[1:4, :3])


def test_integer_index_on_size_one_dim_through_elemwise():
    # reference :586
    x = da.from_array(np.arange(5.0).reshape(1, 5), chunks=(1, 5))
    y = da.from_array(np.ones((4, 5)), chunks=(2, 5))
    r = (x + y)[0, :]
    assert_eq(r, (np.arange(5.0).reshape(1, 5) + np.ones((4, 5)))[0, :])


def test_integer_index_through_elemwise_broadcast():
    x = da.from_array(np.arange(20.0).reshape(4, 5), chunks=(2, 5))
    v = da.from_array(np.arange(5.0), chunks=5)
    r = (x * v)[2, :]
    assert_eq(r, (np.arange(20.0).reshape(4, 5) * np.arange(5.0))[2, :])


def test_empty_slice_through_elemwise_broadcast():
    x = da.from_array(np.arange(20.0).reshape(4, 5), chunks=(2, 5))
    v = da.from_array(np.arange(5.0), chunks=5)
    r = (x * v)[0:0, :]
    assert r.optimize().shape == (0, 5)
    assert_eq(r, np.empty((0, 5)))


def test_empty_slice_not_pushed_through_reduction():
    # reference :664
    x = da.from_array(np.arange(20.0).reshape(4, 5), chunks=(2, 5))
    r = x.sum(axis=0, keepdims=True)[0:0]
    assert r.optimize().shape == (0, 5)
    assert_eq(r, np.arange(20.0).reshape(4, 5).sum(axis=0, keepdims=True)[0:0])


# -- round-3 additions: none-slice (newaxis) family (reference :1010-1075) ---


def test_none_slice_pushes_through_elemwise():
    x = da.ones((10, 10), chunks=5)
    y = da.ones((10, 10), chunks=5)
    result = (x + y)[None, :5, :]
    expected = (x[:5, :] + y[:5, :])[None, :, :]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, np.full((1, 5, 10), 2.0))


def test_none_slice_multiple_nones():
    x = da.from_array(np.arange(20.0).reshape(4, 5), chunks=(2, 5))
    y = da.ones((4, 5), chunks=(4, 5))
    result = (x + y)[None, :2, None, :3]
    expected = (x[:2, :3] + y[:2, :3])[None, :, None, :]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, (np.arange(20.0).reshape(4, 5) + 1)[None, :2, None, :3])


def test_none_slice_no_slicing_uses_expand_dims():
    from dask_array_tpu.ops.manipulation import ExpandDims

    x = da.ones((10, 10), chunks=5)
    y = da.ones((10, 10), chunks=5)
    result = (x + y)[None, :, :]
    opt = result.expr.simplify()
    assert isinstance(opt, ExpandDims)
    assert_eq(result, np.full((1, 10, 10), 2.0))


def test_none_slice_through_transpose():
    x = da.from_array(np.arange(20.0).reshape(4, 5), chunks=(2, 5))
    result = x.T[None, :3, :2]
    expected = x[:2, :3].T[None, :, :]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, np.arange(20.0).reshape(4, 5).T[None, :3, :2])


# -- round-3 additions: keepdims + shared + multi-window (reference :1077+) --


def test_slice_on_keepdims_reduced_axis_values():
    x = np.arange(6.0).reshape(3, 2)
    d = da.from_array(x, chunks=(1, 1))
    expected = x.sum(axis=0, keepdims=True)
    assert_eq(d.sum(axis=0, keepdims=True)[0, :], expected[0, :])
    assert_eq(d.sum(axis=0, keepdims=True)[0:1, 1], expected[0:1, 1])
    assert_eq(d.mean(axis=1, keepdims=True)[:, 0], x.mean(axis=1, keepdims=True)[:, 0])


def test_empty_source_region_not_dropped():
    x = np.ones((1, 1, 1))
    d = da.from_array(x, chunks=(1, 1, 1))
    leaf = da.from_array(np.ones((1, 0, 1)), chunks=((1,), (0,), (1,)))
    result = (d[:, 0:0, :] + leaf)[:, :, 0:0]
    expected = (x[:, 0:0, :] + np.ones((1, 0, 1)))[:, :, 0:0]
    assert result.optimize().shape == expected.shape
    assert_eq(result, expected)


def test_integer_index_before_expanded_axis():
    x2 = np.arange(2.0).reshape(1, 2)
    d2 = da.from_array(x2, chunks=(1, 1))
    result = da.expand_dims(d2, 1)[0, :, :]
    expected = np.expand_dims(x2, 1)[0, :, :]
    assert result.optimize().shape == expected.shape
    assert_eq(result, expected)
    x1 = np.arange(1.0)
    d1 = da.from_array(x1, chunks=1)
    result = da.expand_dims(d1, 1)[0, :]
    assert result.optimize().shape == (1,)
    assert_eq(result, np.expand_dims(x1, 1)[0, :])


def test_slice_not_pushed_into_shared_leaf():
    x = da.from_array(np.arange(10000.0).reshape(100, 100), chunks=(10, 10))
    z = x[:5].sum() + x.sum()
    froms = {n._name for n in z.expr.simplify().walk() if isinstance(n, FromArray)}
    assert len(froms) == 1
    xn = np.arange(10000.0).reshape(100, 100)
    assert_eq(z, xn[:5].sum() + xn.sum())


def test_multi_window_slices_still_push(rng):
    x = da.from_array(np.arange(10000.0).reshape(100, 100), chunks=(10, 10))
    y = (x + 1) * 2
    z = y[:5] + y[10:15]
    expected = ((x[:5] + 1) * 2) + ((x[10:15] + 1) * 2)
    assert z.expr.simplify()._name == expected.expr.simplify()._name
    xn = np.arange(10000.0).reshape(100, 100)
    yn = (xn + 1) * 2
    assert_eq(z, yn[:5] + yn[10:15])


def test_multi_window_slices_with_grid_sensitive_consumer(rng):
    arr = np.arange(400.0).reshape(20, 20)
    n = da.from_array(arr, chunks=(5, 20)) + 1.0
    w1 = da.map_overlap(
        lambda b: b * 2.0, n[2:18, :], depth={0: 1, 1: 0}, boundary="none"
    )
    w2 = n[5:15, :] * 3.0
    base = arr + 1.0
    assert_eq(w1, base[2:18, :] * 2.0)
    assert_eq(w2, base[5:15, :] * 3.0)
    combined = da.concatenate([w1[:6], w2[:6]], axis=0)
    assert_eq(
        combined,
        np.concatenate([base[2:18, :][:6] * 2.0, base[5:15, :][:6] * 3.0], axis=0),
    )


# -- round-3 additions II: region deferral + culling (reference :96-330) -----


from dask_array_tpu._blockwise import Elemwise  # noqa: E402


def leaf_elems(expr):
    """Total elements read across FromArray leaves (the repo's analog of the
    reference's task-count assertions: fewer elements == less work)."""
    total = 0
    for n in expr.walk():
        if isinstance(n, FromArray):
            total += int(np.prod([sum(c) for c in n.chunks]))
    return total


class _RecordingSource:
    """ndarray-like host source that records every __getitem__ region."""

    def __init__(self, arr):
        self._arr = arr
        self.reads = []

    @property
    def shape(self):
        return self._arr.shape

    @property
    def dtype(self):
        return self._arr.dtype

    @property
    def ndim(self):
        return self._arr.ndim

    def __getitem__(self, key):
        self.reads.append(key)
        return self._arr[key]


def test_region_slice_stays_deferred_no_copy():
    # reference test_region_numpy_* family: the pushed-down slice becomes a
    # deferred region on the leaf; the host array is NOT copied at optimize
    # time (this framework defers ALL sources, numpy included — the region
    # is applied at leaf-buffer bind time)
    arr = np.arange(10000.0).reshape(100, 100)
    x = da.from_array(arr, chunks=(10, 10))
    opt = x[12:18, 34:39].expr.simplify()
    assert isinstance(opt, FromArray), opt.tree_repr()
    assert opt.source is x.expr.source
    assert opt.region is not None
    np.testing.assert_array_equal(arr[tuple(opt.region)], arr[12:18, 34:39])
    assert tuple(map(sum, opt.chunks)) == (6, 5)
    assert_eq(x[12:18, 34:39], arr[12:18, 34:39])


def test_region_full_slice_has_no_region():
    arr = np.arange(100.0).reshape(10, 10)
    x = da.from_array(arr, chunks=5)
    opt = x[:, :].expr.simplify()
    assert isinstance(opt, FromArray)
    assert opt.region is None
    assert opt.source is x.expr.source


def test_region_host_read_is_only_the_region():
    # reference test_region_single_chunk: the host read must be the sliced
    # region, never a full chunk (here: never the full array)
    arr = np.arange(10000.0).reshape(100, 100)
    src = _RecordingSource(arr)
    x = da.from_array(src, chunks=(10, 10), asarray=False)
    y = x[12:18, 34:39] * 2
    np.testing.assert_allclose(np.asarray(y.compute()), arr[12:18, 34:39] * 2)
    region_reads = [k for k in src.reads if arr[k].size > 0]
    assert region_reads
    assert all(arr[k].size <= 6 * 5 for k in region_reads), src.reads


def test_region_spanning_chunks_reads_one_region():
    # a slice spanning 2x2 chunks is still ONE deferred region read (dense
    # leaf design; the reference emits 4 tasks — same data volume)
    arr = np.arange(10000.0).reshape(100, 100)
    src = _RecordingSource(arr)
    x = da.from_array(src, chunks=(10, 10), asarray=False)
    y = x[15:25, 35:45] + 0.0
    np.testing.assert_allclose(np.asarray(y.compute()), arr[15:25, 35:45])
    region_reads = [k for k in src.reads if arr[k].size > 0]
    assert all(arr[k].size <= 10 * 10 for k in region_reads), src.reads


def test_block_culling_slice_still_pushes_through_computed_node():
    # reference :109
    arr = np.arange(40.0)
    x = da.from_array(arr, chunks=8)
    y = (x + 1)[8:40]
    opt = y.expr.simplify()
    assert isinstance(opt, Elemwise), opt.tree_repr()
    froms = [n for n in opt.walk() if isinstance(n, FromArray)]
    assert len(froms) == 1
    assert tuple(map(sum, froms[0].chunks)) == (32,)
    assert_eq(y, arr[8:40] + 1)


def test_no_cull_slice_still_pushes_into_from_array():
    # reference :122 — a non-chunk-aligned slice still pushes
    arr = np.arange(40.0)
    x = da.from_array(arr, chunks=8)
    opt = x[7:39].expr.simplify()
    assert isinstance(opt, FromArray), opt.tree_repr()
    assert sum(opt.chunks[0]) == 32
    assert_eq(x[7:39], arr[7:39])


# -- round-3 additions II: concat/stack/broadcast structure (ref :522-728) ---


def test_slice_through_concat_different_axis_structure():
    a = da.ones((10, 20), chunks=5)
    b = da.ones((10, 20), chunks=5)
    result = da.concatenate([a, b], axis=0)[:, :5]
    expected = da.concatenate([a[:, :5], b[:, :5]], axis=0)
    assert result.expr.simplify()._name == expected.expr.simplify()._name


def test_slice_through_concat_reduces_leaf_window(rng):
    a = da.from_array(rng.standard_normal((100, 100)), chunks=10)
    b = da.from_array(rng.standard_normal((100, 100)), chunks=10)
    concat = da.concatenate([a, b], axis=0)
    assert leaf_elems(concat[:5].expr.simplify()) < leaf_elems(concat.expr.simplify())


def test_slice_through_stack_structure_subset():
    a = da.ones((10, 5), chunks=5)
    b = da.ones((10, 5), chunks=5)
    c = da.ones((10, 5), chunks=5)
    result = da.stack([a, b, c], axis=0)[:1]
    expected = da.stack([a], axis=0)
    assert result.expr.simplify()._name == expected.expr.simplify()._name


def test_slice_through_stack_other_axis_structure():
    a = da.ones((10, 20), chunks=5)
    b = da.ones((10, 20), chunks=5)
    result = da.stack([a, b], axis=0)[:, :5, :10]
    expected = da.stack([a[:5, :10], b[:5, :10]], axis=0)
    assert result.expr.simplify()._name == expected.expr.simplify()._name


def test_slice_through_stack_mixed(rng):
    xs = [rng.standard_normal((10, 20)) for _ in range(3)]
    ds = [da.from_array(x, chunks=5) for x in xs]
    result = da.stack(ds, axis=0)[:2, :5]
    expected = da.stack([ds[0][:5], ds[1][:5]], axis=0)
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, np.stack(xs)[:2, :5])


def test_slice_through_stack_reduces_leaf_window(rng):
    ds = [da.from_array(rng.standard_normal((100, 100)), chunks=10) for _ in range(3)]
    stacked = da.stack(ds, axis=0)
    assert leaf_elems(stacked[:1].expr.simplify()) < leaf_elems(stacked.expr.simplify())


def test_slice_through_broadcast_to_structure():
    x = da.ones((10,), chunks=5)
    cases = [
        (da.broadcast_to(x, (20, 10))[:5, :], da.broadcast_to(x, (5, 10))),
        (da.broadcast_to(x, (20, 10))[:, :5], da.broadcast_to(x[:5], (20, 5))),
        (da.broadcast_to(x, (20, 10))[:5, :3], da.broadcast_to(x[:3], (5, 3))),
    ]
    for result, expected in cases:
        assert result.expr.simplify()._name == expected.expr.simplify()._name


def test_slice_through_broadcast_to_broadcasted_dim_structure(rng):
    # slicing a dim that was size-1 in the input cannot push on that dim
    src = rng.standard_normal((1, 10))
    x = da.from_array(src, chunks=(1, 5))
    result = da.broadcast_to(x, (20, 10))[:5, :3]
    expected = da.broadcast_to(x[:, :3], (5, 3))
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, np.broadcast_to(src, (20, 10))[:5, :3])


def test_slice_through_broadcast_to_reduces_leaf_window(rng):
    x = da.from_array(rng.standard_normal((100,)), chunks=10)
    broadcasted = da.broadcast_to(x, (100, 100))
    assert leaf_elems(broadcasted[:5, :5].expr.simplify()) < leaf_elems(
        broadcasted.expr.simplify()
    )


# -- round-3 additions II: blockwise spine (reference blockwise :23-160) -----


def test_slice_through_reduction_blockwise_structure():
    x = da.ones((100, 100), chunks=(10, 10))
    result = x.sum(axis=0)[:5]
    expected = x[:, :5].sum(axis=0)
    assert result.expr.simplify()._name == expected.expr.simplify()._name

    result1 = x.sum(axis=1)[:5]
    expected1 = x[:5, :].sum(axis=1)
    assert result1.expr.simplify()._name == expected1.expr.simplify()._name


def test_slice_through_elemwise_structure():
    x = da.ones((100, 100), chunks=(10, 10))
    y = da.ones((100, 100), chunks=(10, 10))
    result = (x + y)[:5, :10]
    expected = x[:5, :10] + y[:5, :10]
    assert result.expr.simplify()._name == expected.expr.simplify()._name

    result1 = da.sin(x)[:5, :10]
    expected1 = da.sin(x[:5, :10])
    assert result1.expr.simplify()._name == expected1.expr.simplify()._name


def test_slice_through_broadcast_row_structure(rng):
    arr = rng.standard_normal((10, 10))
    row = rng.standard_normal((10,))
    x = da.from_array(arr, chunks=(5, 5))
    r = da.from_array(row, chunks=5)
    result = (x + r)[:3, :4]
    expected = x[:3, :4] + r[:4]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, (arr + row)[:3, :4])


def test_slice_through_broadcast_column_structure(rng):
    arr = rng.standard_normal((10, 10))
    col = rng.standard_normal((10, 1))
    x = da.from_array(arr, chunks=(5, 5))
    c = da.from_array(col, chunks=(5, 1))
    result = (x + c)[:3, :4]
    expected = x[:3, :4] + c[:3, :]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, (arr + col)[:3, :4])


def test_slice_through_broadcast_scalar_structure(rng):
    arr = rng.standard_normal((10, 10))
    x = da.from_array(arr, chunks=(5, 5))
    result = (x + 5)[:3, :4]
    expected = x[:3, :4] + 5
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, (arr + 5)[:3, :4])


def test_slice_through_broadcast_size_one_dims(rng):
    # inputs with size-1 dims in DIFFERENT positions: the output slice must
    # keep each input's size-1 dims un-sliced
    a_np = np.arange(20.0).reshape(1, 20, 1)
    b_np = np.arange(30.0).reshape(1, 1, 30)
    a = da.from_array(a_np, chunks=(1, 10, 1))
    b = da.from_array(b_np, chunks=(1, 1, 15))
    result = a + b
    assert result.shape == (1, 20, 30)
    sliced = result[:, 5:10, 10:20]
    assert sliced.shape == (1, 5, 10)
    sliced.expr.simplify()  # must not raise
    assert_eq(sliced, (a_np + b_np)[:, 5:10, 10:20])


def test_slice_new_axis_map_blocks_pushes_when_safe():
    x = da.ones((20, 20), chunks=(5, 5))
    y = da.map_blocks(lambda b: b[..., None], x, new_axis=2, dtype=float)
    z = y[:5, :5, :]  # not slicing the new axis
    assert_eq(z, np.ones((20, 20))[:5, :5, None])


def test_slice_only_new_axis_values():
    arr = np.arange(100.0).reshape(10, 10)
    x = da.from_array(arr, chunks=(5, 5))
    y = da.map_blocks(
        lambda b: np.repeat(np.asarray(b)[..., None], 3, axis=2),
        x,
        new_axis=2,
        chunks=(5, 5, 3),
        dtype=arr.dtype,
    )
    assert_eq(y[:, :, :2], np.repeat(arr[..., None], 3, axis=2)[:, :, :2])
    assert_eq(y[:3, :4, :], np.repeat(arr[..., None], 3, axis=2)[:3, :4, :])


def test_slice_symbolic_new_axes_values():
    x_np = np.arange(6.0)
    x = da.from_array(x_np, chunks=3)
    y = da.blockwise(
        lambda block: np.broadcast_to(np.asarray(block)[:, None], (block.shape[0], 5)),
        "az",
        x,
        "a",
        new_axes={"z": 5},
        dtype=x.dtype,
    )
    expected = np.broadcast_to(x_np[:, None], (6, 5))
    assert_eq(y[:, :2], expected[:, :2])
    assert_eq(y[2:5, :], expected[2:5, :])


def test_integer_index_out_of_bounds_on_broadcast_dim():
    # regression parity (reference blockwise :643): integer index valid for
    # the broadcast OUTPUT but out of bounds for a size-1 input
    scalar = da.from_array(np.float32(0.0), chunks=-1)
    arr1 = da.from_array(np.array([[0.0, 1.0]], dtype="float32"), chunks=-1)
    arr2 = da.from_array(np.zeros((1, 1, 1, 1), dtype="float32"), chunks=-1)
    result = scalar + arr1 + arr2
    assert result.shape == (1, 1, 1, 2)
    indexed = result[0, 0, 0, 1]
    assert indexed.shape == ()
    assert float(indexed.compute()) == 1.0


def test_slice_through_tensordot_reduces_leaf_window(rng):
    a = da.from_array(rng.standard_normal((60, 80)), chunks=(30, 40))
    b = da.from_array(rng.standard_normal((80, 50)), chunks=(40, 25))
    r = da.tensordot(a, b, axes=1)
    assert leaf_elems(r[:30, :].expr.simplify()) < leaf_elems(r.expr.simplify())


# -- round-3 additions II: keepdims + shared-node (reference :1093-1207) -----


def test_empty_slice_on_keepdims_reduced_axis_shape():
    x = np.arange(4.0)
    d = da.from_array(x, chunks=2)
    result = d.sum(axis=0, keepdims=True)[0:0]
    expected = x.sum(axis=0, keepdims=True)[0:0]
    assert result.optimize().shape == expected.shape
    assert_eq(result, expected)


def test_slice_on_keepdims_still_pushes_non_reduced_axes():
    x_np = np.arange(10000.0).reshape(100, 100)
    x = da.from_array(x_np, chunks=(10, 10))
    sliced = x.sum(axis=0, keepdims=True)[:, 5:20]
    assert_eq(sliced, x_np.sum(axis=0, keepdims=True)[:, 5:20])
    assert leaf_elems(sliced.expr.simplify()) < leaf_elems(
        x.sum(axis=0, keepdims=True).expr.simplify()
    )


def test_slice_not_pushed_into_shared_node():
    # pushing into a node another parent consumes whole would duplicate its
    # work; y must stay shared (one elemwise chain, not two)
    x = da.from_array(np.arange(10000.0).reshape(100, 100), chunks=(10, 10))
    y = (x + 1) * 2
    z = y[:99].sum() + y.sum()
    simplified = z.expr.simplify()
    froms = {n._name for n in simplified.walk() if isinstance(n, FromArray)}
    assert len(froms) == 1
    n_elemwise = sum(1 for n in simplified.walk() if isinstance(n, Elemwise))
    assert n_elemwise <= 3, simplified.tree_repr()
    xn = np.arange(10000.0).reshape(100, 100)
    yn = (xn + 1) * 2
    assert_eq(z, yn[:99].sum() + yn.sum())


def test_reduction_slice_pushdown_reduces_leaf_window(rng):
    arr = rng.standard_normal((100, 100))
    x = da.from_array(arr, chunks=(10, 10))
    full = x.sum(axis=0)
    sliced = x.sum(axis=0)[:5]
    assert leaf_elems(sliced.expr.simplify()) < leaf_elems(full.expr.simplify())
    assert_eq(sliced, arr.sum(axis=0)[:5])


# ---------------------------------------------------------------------------
# slice through reshape (parity: reference Reshape._accept_slice,
# manipulation/_reshape.py; trailing-run cases are a capability extension)
# ---------------------------------------------------------------------------

_RESHAPE_PUSH = [
    # (in_shape, chunks, out_shape, index)  — slice touches preserved axes only
    ((10, 6), (2, 3), (10, 2, 3), np.s_[2:7]),            # leading, split tail
    ((10, 6), (2, 3), (10, 2, 3), np.s_[::-2]),           # leading, neg step
    ((10, 6), (2, 3), (10, 2, 3), np.s_[4]),              # leading, int drop
    ((10, 2, 3), (2, 1, 3), (10, 6), np.s_[1:9]),         # leading, merge tail
    ((4, 3, 5), 2, (12, 5), np.s_[:, 1:4]),               # trailing, merge head
    ((12, 5), (4, 5), (4, 3, 5), np.s_[:, :, ::2]),       # trailing, split head
    ((10, 4, 6), (3, 2, 2), (10, 24), np.s_[2:9, :]),     # lead run of 1
    ((10, 4, 6), (3, 2, 2), (10, 2, 12), np.s_[1:8]),     # lead, regrouped mid
    ((2, 3, 4, 5), 2, (2, 12, 5), np.s_[1, :, 2:5]),      # lead int + trail
    ((2, 3, 4, 5), 2, (6, 4, 5), np.s_[:, 1:3, ::-1]),    # trail run of 2
    ((1, 5), (1, 2), (5,), np.s_[1:4]),                   # size-1 lead dropped
    ((6,), 2, (6, 1), np.s_[2:5]),                        # trailing size-1 out
]


@pytest.mark.parametrize("in_shape,chunks,out_shape,idx", _RESHAPE_PUSH)
def test_slice_through_reshape_pushes(rng, in_shape, chunks, out_shape, idx):
    arr = rng.standard_normal(in_shape)
    x = da.from_array(arr, chunks=chunks)
    sliced = x.reshape(out_shape)[idx]
    assert_eq(sliced, arr.reshape(out_shape)[idx])
    simplified = sliced.expr.simplify()
    # the slice moved below the reshape: no Slice node remains above it
    # (it fused into the FromArray leaf), and the leaf reads fewer elements
    assert n_slices(simplified) == 0, simplified.tree_repr()
    assert leaf_elems(simplified) < leaf_elems(x.reshape(out_shape).expr.simplify())


_RESHAPE_DECLINE = [
    # slice touches a regrouped (non-preserved) axis — must stay above
    ((4, 3, 5), 2, (12, 5), np.s_[3:9]),
    ((12, 5), (4, 5), (4, 3, 5), np.s_[:, 1:3]),
    ((10, 6), (2, 3), (10, 2, 3), np.s_[:, 1]),
    ((4, 6), 2, (6, 4), np.s_[1:5]),                      # interleaved fallback
]


@pytest.mark.parametrize("in_shape,chunks,out_shape,idx", _RESHAPE_DECLINE)
def test_slice_through_reshape_declines(rng, in_shape, chunks, out_shape, idx):
    arr = rng.standard_normal(in_shape)
    x = da.from_array(arr, chunks=chunks)
    sliced = x.reshape(out_shape)[idx]
    assert_eq(sliced, arr.reshape(out_shape)[idx])
    assert n_slices(sliced.expr.simplify()) >= 1


def test_slice_through_reshape_shared_consumer_declines(rng):
    arr = rng.standard_normal((10, 6))
    x = da.from_array(arr, chunks=(2, 3))
    r = x.reshape(10, 2, 3)
    z = r[2:7].sum() + r.sum()
    assert_eq(z, arr.reshape(10, 2, 3)[2:7].sum() + arr.reshape(10, 2, 3).sum())


def test_slice_through_reshape_chains_to_leaf(rng):
    # reshape-of-reshape collapses, then the slice pushes through once
    arr = rng.standard_normal((8, 6))
    x = da.from_array(arr, chunks=(2, 3))
    sliced = x.reshape(8, 2, 3).reshape(8, 6)[3:6]
    assert_eq(sliced, arr[3:6])
    simplified = sliced.expr.simplify()
    assert n_slices(simplified) == 0, simplified.tree_repr()


# ported from reference test_slice_through_reshape.py (272 LoC): the
# name-equality structural discipline + None interplay
def test_slice_through_reshape_name_equality(rng):
    arr = np.arange(60).reshape((10, 6))
    x = da.from_array(arr, chunks=(5, 3))
    r = x.reshape((10, 2, 3))[:5]
    e = x[:5].reshape((5, 2, 3))
    assert r.expr.simplify()._name == e.expr.simplify()._name
    assert_eq(r, arr.reshape((10, 2, 3))[:5])


def test_slice_with_none_through_reshape(rng):
    arr = np.arange(60).reshape((10, 6))
    x = da.from_array(arr, chunks=(5, 3))
    r = x.reshape((10, 2, 3))[:5, None]
    e = x[:5].reshape((5, 2, 3))[:, None]
    assert r.expr.simplify()._name == e.expr.simplify()._name
    assert_eq(r, arr.reshape((10, 2, 3))[:5, None])


def test_slice_with_none_at_end_through_reshape(rng):
    arr = np.arange(60).reshape((10, 6))
    x = da.from_array(arr, chunks=(5, 3))
    r = x.reshape((10, 2, 3))[:5, :, :, None]
    assert_eq(r, arr.reshape((10, 2, 3))[:5, :, :, None])
    assert n_slices(r.expr.simplify()) == 0


def test_slice_with_multiple_nones_through_reshape(rng):
    arr = np.arange(60).reshape((10, 6))
    x = da.from_array(arr, chunks=(5, 3))
    r = x.reshape((10, 2, 3))[None, :5, None]
    assert_eq(r, arr.reshape((10, 2, 3))[None, :5, None])
    assert n_slices(r.expr.simplify()) == 0


_RESHAPE_REF_GRID = [
    ((20, 6), (20, 2, 3), np.s_[:10]),
    ((20, 6), (20, 2, 3), np.s_[5:15]),
    ((20, 12), (20, 3, 4), np.s_[:8]),
    ((20, 2, 3), (20, 6), np.s_[:10]),
    ((20, 4, 5), (20, 20), np.s_[5:15]),
    ((10, 5, 6), (10, 5, 2, 3), np.s_[:5, :3]),
    ((10, 5, 4), (10, 5, 2, 2), np.s_[3:8, :4]),
]


@pytest.mark.parametrize("in_shape,out_shape,slc", _RESHAPE_REF_GRID)
def test_slice_through_reshape_reference_grid(in_shape, out_shape, slc):
    arr = np.arange(int(np.prod(in_shape))).reshape(in_shape)
    chunks = tuple(max(1, s // 2) for s in in_shape)
    x = da.from_array(arr, chunks=chunks)
    assert_eq(x.reshape(out_shape)[slc], arr.reshape(out_shape)[slc])
    assert n_slices(x.reshape(out_shape)[slc].expr.simplify()) == 0


def test_slice_through_reshape_reduces_numblocks(rng):
    arr = rng.standard_normal((20, 6))
    x = da.from_array(arr, chunks=(2, 3))
    full = x.reshape((20, 2, 3))
    sliced = full[:6]
    s = sliced.expr.simplify()
    assert int(np.prod(s.numblocks)) < int(np.prod(full.expr.simplify().numblocks))
    assert_eq(sliced, arr.reshape((20, 2, 3))[:6])
