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


def test_mixed_consumers_still_correct():
    # one part consumed directly AND through the collapsed stack
    parts = _parts(3)
    s = da.stack(parts, axis=0)
    direct = parts[1] + 1
    total = s.sum() + direct.sum()
    expected = np.stack([mk(i) for i in range(3)]).sum() + (mk(1) + 1).sum()
    assert np.isclose(float(total.compute()), expected)
