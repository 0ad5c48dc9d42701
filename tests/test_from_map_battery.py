"""from_map / from_delayed grouped-collapse battery.

Ported scenario-for-scenario from the reference spine
``/root/reference/dask_array/tests/test_from_map.py`` (grouped-layer
collapse of stack/concatenate/block-of-from_delayed, merge declines,
shape validation).  The records/frisky half of that spine is N/A here —
this framework's cross-process program identity is the planrec grammar
(see tests/test_planrec.py), not a task-records protocol.

The collapse invariant: N stacked/concatenated loader leaves simplify to
ONE FromMap node with N block args — the plan stays O(1) nodes for the
read-many-files pattern.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu.io._from_map import FromMap, delayed, from_delayed, from_map


def mk(i):
    return np.full((4, 3), i, dtype=np.float64)


def mk_block(i):
    return np.full((2, 3), i, dtype=np.float64)


def _parts(n, shape=(4, 3)):
    return [from_delayed(delayed(mk)(i), shape=shape, dtype="f8") for i in range(n)]


# ---------------------------------------------------------------------------
# values and structure
# ---------------------------------------------------------------------------


def test_from_map_values_and_structure():
    fm = from_map(mk_block, [0, 1, 2, 3], chunks=((2, 2), (3, 3)))
    assert type(fm.expr) is FromMap
    assert fm.chunks == ((2, 2), (3, 3))
    expected = np.block([[mk_block(0), mk_block(1)], [mk_block(2), mk_block(3)]])
    np.testing.assert_array_equal(np.asarray(fm.compute()), expected)


def test_from_map_passes_constant_kwargs():
    def f(i, scale=1):
        return np.full((2,), i * scale, dtype="f8")

    fm = from_map(f, [1, 2, 3], chunks=((2, 2, 2),), scale=10)
    np.testing.assert_array_equal(np.asarray(fm.compute()), np.repeat([10, 20, 30], 2).astype("f8"))


def test_from_map_over_3d_block_grid():
    def f(i):
        return np.full((2, 2, 2), i, dtype="f8")

    fm = from_map(f, list(range(8)), chunks=((2, 2), (2, 2), (2, 2)))
    got = np.asarray(fm.compute())
    # C-order block numbering
    assert got[0, 0, 0] == 0 and got[0, 0, 3] == 1 and got[0, 3, 0] == 2 and got[3, 0, 0] == 4
    assert got.shape == (4, 4, 4)


def test_from_map_rejects_values_shape_mismatch():
    bad = from_map(lambda i: np.zeros((5,)), [0], chunks=((3,),), dtype="f8")
    with pytest.raises(ValueError, match="expected"):
        bad.compute()


def test_from_map_scalar_return_supports_0d_block():
    fm = from_map(lambda i: np.float64(i * 2), [3], chunks=((1,),), dtype="f8")
    np.testing.assert_array_equal(np.asarray(fm.compute()), [6.0])


def test_from_map_requires_chunk_grid_match():
    with pytest.raises(ValueError, match="blocks"):
        from_map(mk, [0, 1, 2], chunks=((4, 4), (3,)), dtype="f8")


# ---------------------------------------------------------------------------
# grouped collapse: stack/concatenate/block of loader leaves -> ONE FromMap
# ---------------------------------------------------------------------------


def test_stack_of_from_delayed_becomes_one_from_map():
    parts = _parts(10)
    s = da.stack(parts, axis=0)
    opt = s.expr.simplify()
    assert type(opt) is FromMap
    assert len(list(opt.walk())) == 1
    assert opt.chunks == ((1,) * 10, (4,), (3,))
    np.testing.assert_array_equal(np.asarray(s.compute()), np.stack([mk(i) for i in range(10)]))


def test_stack_on_inner_axis_becomes_one_from_map():
    parts = _parts(5)
    s = da.stack(parts, axis=1)
    opt = s.expr.simplify()
    assert type(opt) is FromMap
    np.testing.assert_array_equal(
        np.asarray(s.compute()), np.stack([mk(i) for i in range(5)], axis=1)
    )


def test_concatenate_of_from_delayed_becomes_one_from_map():
    parts = _parts(6)
    c = da.concatenate(parts, axis=0)
    opt = c.expr.simplify()
    assert type(opt) is FromMap
    assert opt.chunks == ((4,) * 6, (3,))
    np.testing.assert_array_equal(
        np.asarray(c.compute()), np.concatenate([mk(i) for i in range(6)])
    )


def test_concatenate_of_from_map_merges_into_one():
    fm1 = from_map(mk_block, [0, 1, 2, 3], chunks=((2, 2), (3, 3)))
    fm2 = from_map(mk_block, [10, 11, 12, 13], chunks=((2, 2), (3, 3)))
    for axis in (0, 1):
        m = da.concatenate([fm1, fm2], axis=axis)
        opt = m.expr.simplify()
        assert type(opt) is FromMap, axis
        e1 = np.block([[mk_block(0), mk_block(1)], [mk_block(2), mk_block(3)]])
        e2 = np.block([[mk_block(10), mk_block(11)], [mk_block(12), mk_block(13)]])
        np.testing.assert_array_equal(
            np.asarray(m.compute()), np.concatenate([e1, e2], axis=axis)
        )


def test_nested_concatenate_of_stacks_collapses_to_one_from_map():
    parts = _parts(6)
    nested = da.concatenate([da.stack(parts[:3]), da.stack(parts[3:])], axis=0)
    opt = nested.expr.simplify()
    assert type(opt) is FromMap
    assert len(list(opt.walk())) == 1
    np.testing.assert_array_equal(
        np.asarray(nested.compute()), np.stack([mk(i) for i in range(6)])
    )


def test_block_of_from_delayed_collapses_to_one_from_map():
    parts = _parts(4)
    b = da.block([[parts[0], parts[1]], [parts[2], parts[3]]])
    opt = b.expr.simplify()
    assert type(opt) is FromMap
    expected = np.block([[mk(0), mk(1)], [mk(2), mk(3)]])
    np.testing.assert_array_equal(np.asarray(b.compute()), expected)


def test_expand_dims_folds_into_from_map():
    fm = from_map(mk_block, [0, 1], chunks=((2, 2), (3,)))
    e = da.expand_dims(fm, 0)
    opt = e.expr.simplify()
    assert type(opt) is FromMap
    assert opt.chunks == ((1,), (2, 2), (3,))
    np.testing.assert_array_equal(
        np.asarray(e.compute()), np.concatenate([mk_block(0), mk_block(1)])[None]
    )


def test_merge_declines_when_func_differs():
    def other(i):
        return np.full((4, 3), -i, dtype=np.float64)

    a = from_delayed(delayed(mk)(1), shape=(4, 3), dtype="f8")
    b = from_delayed(delayed(other)(5), shape=(4, 3), dtype="f8")
    m = da.concatenate([a, b], axis=0)
    from dask_array_tpu.ops.stacking import Concatenate

    assert type(m.expr.simplify()) is Concatenate
    np.testing.assert_array_equal(
        np.asarray(m.compute()), np.concatenate([mk(1), other(5)])
    )


def test_merge_declines_when_kwargs_differ():
    def f(i, scale=1):
        return np.full((2,), i * scale, dtype="f8")

    a = from_map(f, [1], chunks=((2,),), scale=10)
    b = from_map(f, [1], chunks=((2,),), scale=20)
    m = da.concatenate([a, b], axis=0)
    from dask_array_tpu.ops.stacking import Concatenate

    assert type(m.expr.simplify()) is Concatenate
    np.testing.assert_array_equal(np.asarray(m.compute()), [10, 10, 20, 20])


def test_merge_declines_when_off_axis_chunks_differ():
    def f(i):
        return np.full((4, 3), i, dtype="f8")

    a = from_map(f, [0, 1], chunks=((4, 4), (3,)))
    b = from_map(f, [2], chunks=((4,), (3,)))
    # off-axis (axis 1) grids match -> merges; mismatched would decline
    m = da.concatenate([a, b], axis=0)
    assert type(m.expr.simplify()) is FromMap

    c = from_map(f, [5, 6], chunks=((4,), (1, 2)))  # different axis-1 grid
    m2 = da.concatenate([a, c], axis=0)
    from dask_array_tpu.ops.stacking import Concatenate

    assert type(m2.expr.simplify()) is Concatenate


def test_collapsed_stack_slices_cull_loader_calls():
    # the payoff: slicing the stacked result host-loads ONLY touched blocks
    calls = []

    def spy(i):
        calls.append(i)
        return np.full((4, 3), i, dtype=np.float64)

    parts = [from_delayed(delayed(spy)(i), shape=(4, 3), dtype="f8") for i in range(10)]
    z = da.stack(parts, axis=0)[7]
    np.testing.assert_array_equal(np.asarray(z.compute()), mk(7))
    assert sorted(set(calls)) == [7]


def test_collapsed_plan_stays_small_at_width():
    # 200 loader leaves -> 1 node; optimize cost must stay trivially flat
    parts = _parts(200)
    s = da.stack(parts, axis=0)
    opt = s.expr.simplify()
    assert type(opt) is FromMap
    assert len(opt.args_per_block) == 200
    assert len(list(opt.walk())) == 1


# ---------------------------------------------------------------------------
# reference spine, second pass: object values grids, 0-d, shape discipline,
# named leaves, multi-task delayed bodies, nested stacks, dedup
# (/root/reference/dask_array/tests/test_from_map.py:102-420)
# ---------------------------------------------------------------------------


def _obj(values):
    a = np.empty(len(values), dtype=object)
    a[:] = list(values)
    return a


def test_from_map_object_values_grid_1d():
    a = from_map(lambda v: np.full(5, v, dtype="int64"), _obj([1, 2, 3]), chunks=((5, 5, 5),), dtype="int64")
    assert a.shape == (15,)
    expected = np.concatenate([np.full(5, v) for v in [1, 2, 3]]).astype("int64")
    np.testing.assert_array_equal(np.asarray(a.compute()), expected)


def test_from_map_object_values_grid_2d():
    # the values array's SHAPE is the block grid — N-D falls out directly
    values = np.empty((2, 2), dtype=object)
    values[:] = [[1, 2], [3, 4]]
    a = from_map(lambda v: np.full((2, 3), v, dtype="int64"), values, chunks=((2, 2), (3, 3)), dtype="int64")
    assert a.shape == (4, 6)
    assert a.numblocks == (2, 2)
    expected = np.block(
        [[np.full((2, 3), 1), np.full((2, 3), 2)], [np.full((2, 3), 3), np.full((2, 3), 4)]]
    ).astype("int64")
    np.testing.assert_array_equal(np.asarray(a.compute()), expected)


def test_from_map_object_values_grid_3d_noncontiguous():
    # a transposed (non-C-contiguous) values view with distinct cells catches
    # a row/column swap in the C-order ravel
    base = np.empty((3, 2), dtype=object)
    base[:] = (np.arange(6).reshape(3, 2) * 10).tolist()
    vals = base.T
    assert vals.shape == (2, 3) and not vals.flags["C_CONTIGUOUS"]
    a = from_map(lambda v: np.full((2, 4), v, dtype="int64"), vals, chunks=((2, 2), (4, 4, 4)), dtype="int64")
    got = np.asarray(a.compute())
    for i in range(2):
        for j in range(3):
            assert (got[2 * i : 2 * i + 2, 4 * j : 4 * j + 4] == int(vals[i, j])).all()


def test_from_map_0d_block_grid_scalar_coerced():
    values = np.empty((), dtype=object)
    values[()] = 7
    a = from_map(lambda v: v * 2, values, chunks=(), dtype="int64")
    assert a.shape == ()
    assert int(a.compute()) == 14


def test_from_map_object_grid_requires_chunks():
    with pytest.raises(ValueError, match="chunks"):
        from_map(mk, _obj([1, 2, 3]), dtype="int64")


def test_from_map_object_grid_block_grid_mismatch():
    with pytest.raises(ValueError, match="block grid"):
        from_map(mk, _obj([1, 2]), chunks=((5, 5, 5),), dtype="int64")


def test_from_map_rejects_reordering_shape_mismatch():
    # same element count, permuted shape: must fail loudly, never silently
    # reshape elements into the wrong order
    values = np.empty((1, 1), dtype=object)
    values[0, 0] = 0
    bad = from_map(lambda _: np.arange(6).reshape(3, 2), values, chunks=((2,), (3,)), dtype="int64")
    with pytest.raises(ValueError, match="incompatible with the declared chunk shape"):
        bad.compute()


def test_named_from_delayed_name_preserved():
    a = from_delayed(delayed(mk)(7), shape=(4, 3), dtype="f8", name="myblock")
    assert a.name == "myblock"
    np.testing.assert_array_equal(np.asarray(a.compute()), mk(7))
    # a named leaf's identity is pinned: stack must NOT rename it onto a
    # merged FromMap
    b = from_delayed(delayed(mk)(8), shape=(4, 3), dtype="f8", name="other")
    s = da.stack([a, b])
    assert type(s.expr.simplify()) is not FromMap
    np.testing.assert_array_equal(np.asarray(s.compute()), np.stack([mk(7), mk(8)]))


def test_multi_task_delayed_body_resolves():
    # a delayed whose body depends on two other delayed values: sub-calls
    # resolve recursively at host-materialization time (the reference consumes
    # multi-task dask.delayed bodies).  Identical bodies are content-addressed
    # to ONE leaf (sound: same code, same args), so the stack still collapses.
    def multi():
        a = delayed(np.ones)(5)
        b = delayed(np.zeros)(5)
        return delayed(lambda x, y: (x + y).astype("int64"))(a, b)

    pieces = [from_delayed(multi(), shape=(5,), dtype="int64") for _ in range(2)]
    arr = da.stack(pieces)
    np.testing.assert_array_equal(
        np.asarray(arr.compute()), np.stack([np.ones(5), np.ones(5)]).astype("int64")
    )

    # genuinely different bodies (different baked constants) decline the merge
    def scaled(k):
        return delayed(lambda x, y, k=k: (x * k + y).astype("int64"))(
            delayed(np.ones)(5), delayed(np.zeros)(5)
        )

    arr2 = da.stack([from_delayed(scaled(2), shape=(5,), dtype="int64"),
                     from_delayed(scaled(3), shape=(5,), dtype="int64")])
    assert type(arr2.expr.simplify()) is not FromMap
    np.testing.assert_array_equal(
        np.asarray(arr2.compute()),
        np.stack([np.full(5, 2), np.full(5, 3)]).astype("int64"),
    )


def test_nested_stacks_build_3d_from_map():
    parts = [from_delayed(delayed(np.full)((5,), v, "int64"), shape=(5,), dtype="int64") for v in [1, 2, 3, 4]]
    arr = da.stack([da.stack(parts[:2]), da.stack(parts[2:])])
    opt = arr.expr.simplify()
    assert type(opt) is FromMap
    assert arr.shape == (2, 2, 5)
    expected = np.stack(
        [np.stack([np.full(5, 1), np.full(5, 2)]), np.stack([np.full(5, 3), np.full(5, 4)])]
    ).astype("int64")
    np.testing.assert_array_equal(np.asarray(arr.compute()), expected)


def test_mixed_rank_block_collapses_to_one_from_map():
    # block over 1-D leaves wraps each in expand_dims; that folds into the
    # FromMap grid, so the mixed-rank block still collapses to one node
    def leaf1d(v):
        return from_delayed(delayed(np.full)((3,), v, "int64"), shape=(3,), dtype="int64")

    arr = da.block([[leaf1d(1)], [leaf1d(2)]])
    opt = arr.expr.simplify()
    assert type(opt) is FromMap
    assert arr.shape == (2, 3)
    np.testing.assert_array_equal(
        np.asarray(arr.compute()),
        np.block([[np.full((3,), 1)], [np.full((3,), 2)]]).astype("int64"),
    )


def test_coalesced_from_map_dedup_same_and_distinct():
    def build(vals):
        return da.concatenate(
            [from_delayed(delayed(mk)(v), shape=(4, 3), dtype="f8") for v in vals]
        )

    assert build([1, 2, 3]).expr.simplify()._name == build([1, 2, 3]).expr.simplify()._name
    assert build([1, 2, 3]).expr.simplify()._name != build([1, 2, 9]).expr.simplify()._name


def test_direct_from_map_dedups():
    a = from_map(mk_block, [0, 1, 2, 3], chunks=((2, 2), (3, 3)))
    b = from_map(mk_block, [0, 1, 2, 3], chunks=((2, 2), (3, 3)))
    assert a.expr._name == b.expr._name


def test_value_correctness_through_rechunk():
    x = da.concatenate(
        [from_delayed(delayed(np.full)((5,), v, "int64"), shape=(5,), dtype="int64") for v in [1, 2, 3, 4]]
    ).rechunk((4,))
    expected = np.concatenate([np.full(5, v) for v in [1, 2, 3, 4]]).astype("int64")
    np.testing.assert_array_equal(np.asarray(x.compute()), expected)


def test_opaque_from_map_never_merges():
    # opaque payload blocks (store load_stored=False targets) must not be
    # concatenated into a merged loader grid
    a = from_map(lambda i: np.full((2,), i, "f8"), [0, 1], chunks=((2, 2),), dtype="f8", _opaque=True)
    b = from_map(lambda i: np.full((2,), i, "f8"), [2, 3], chunks=((2, 2),), dtype="f8", _opaque=True)
    m = da.concatenate([a, b], axis=0)
    assert type(m.expr.simplify()) is not FromMap


def test_mixed_consumers_still_correct():
    # one part consumed directly AND through the collapsed stack
    parts = _parts(3)
    s = da.stack(parts, axis=0)
    direct = parts[1] + 1
    total = s.sum() + direct.sum()
    expected = np.stack([mk(i) for i in range(3)]).sum() + (mk(1) + 1).sum()
    assert np.isclose(float(total.compute()), expected)
