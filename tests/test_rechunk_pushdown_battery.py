"""Rechunk pushdown structural battery.

Ports the CASES of the reference's ``tests/test_rechunk_pushdown.py``
(1108 LoC, 50 tests): dict form, pushes through elemwise/broadcast/
transpose/expand_dims/concatenate, no-op identity, rechunk∘rechunk
collapse, shared-node declines, slice composition, lower-inserted
alignment rechunks.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._rechunk import Rechunk
from dask_array_tpu._slicing import Slice
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.ops._from_array import FromArray


@pytest.fixture
def rng():
    return np.random.default_rng(43)


def types_of(expr):
    return [type(n).__name__ for n in expr.walk()]


def leaf_chunks(expr):
    return [n.chunks for n in expr.walk() if isinstance(n, FromArray)]


def no_rechunk(expr):
    return not any(isinstance(n, Rechunk) for n in expr.walk())


# -- absorb into leaves -------------------------------------------------------


def test_rechunk_dict_simplifies_through_from_array(rng):
    x = rng.standard_normal((40, 24))
    d = da.from_array(x, chunks=(10, 6))
    y = d.rechunk({0: 20})
    opt = y.expr.simplify()
    assert no_rechunk(opt), opt.tree_repr()
    assert leaf_chunks(opt)[0] == ((20, 20), (6, 6, 6, 6))
    assert_eq(y, x)


def test_rechunk_dict_partial_dims(rng):
    x = rng.standard_normal((24, 24))
    d = da.from_array(x, chunks=8)
    y = d.rechunk({1: 12})
    assert y.chunks == ((8, 8, 8), (12, 12))
    assert_eq(y, x)


def test_rechunk_dict_through_elemwise(rng):
    x = rng.standard_normal((30, 30))
    d = da.from_array(x, chunks=10)
    y = (d * 2).rechunk({0: 15, 1: 15})
    opt = y.expr.simplify()
    assert no_rechunk(opt), opt.tree_repr()
    assert leaf_chunks(opt)[0] == ((15, 15), (15, 15))
    assert_eq(y, x * 2)


def test_rechunk_broadcast_elemwise(rng):
    x = rng.standard_normal((20, 16))
    v = rng.standard_normal((16,))
    d = da.from_array(x, chunks=(5, 8))
    dv = da.from_array(v, chunks=8)
    y = (d + dv).rechunk((10, 4))
    assert_eq(y, x + v)
    assert y.chunks == ((10, 10), (4, 4, 4, 4))


def test_rechunk_through_transpose(rng):
    x = rng.standard_normal((18, 12))
    d = da.from_array(x, chunks=6)
    y = d.T.rechunk((12, 9))
    opt = y.expr.simplify()
    assert no_rechunk(opt), opt.tree_repr()
    assert leaf_chunks(opt)[0] == ((9, 9), (12,))
    assert_eq(y, x.T)


def test_rechunk_through_transpose_dict(rng):
    x = rng.standard_normal((18, 12))
    d = da.from_array(x, chunks=6)
    y = d.T.rechunk({0: 4})
    assert_eq(y, x.T)
    assert y.chunks[0] == (4, 4, 4)


def test_rechunk_through_expand_dims(rng):
    x = rng.standard_normal((24,))
    d = da.from_array(x, chunks=6)
    y = da.expand_dims(d, 0).rechunk((1, 12))
    opt = y.expr.simplify()
    assert no_rechunk(opt), opt.tree_repr()
    assert_eq(y, x[None, :])


# -- no-op / collapse ----------------------------------------------------------


def test_rechunk_noop_preserves_identity(rng):
    x = rng.standard_normal((12, 12))
    d = da.from_array(x, chunks=4)
    r = d.rechunk((4, 4))
    assert r.expr._name == d.expr._name  # no node added at all


def test_rechunk_noop_dict(rng):
    d = da.from_array(rng.standard_normal((12,)), chunks=4)
    assert d.rechunk({0: 4}).expr._name == d.expr._name


def test_rechunk_of_rechunk_collapses(rng):
    x = rng.standard_normal((24,))
    d = da.from_array(x, chunks=4).cumsum()  # block absorption
    y = d.rechunk(6).rechunk(12)
    opt = y.expr.simplify()
    assert sum(1 for n in opt.walk() if isinstance(n, Rechunk)) <= 1, opt.tree_repr()
    assert_eq(y, np.cumsum(x))


def test_rechunk_split_and_merge_correctness(rng):
    x = rng.standard_normal((30,))
    d = da.from_array(x, chunks=(3, 7, 5, 5, 10)).cumsum()
    y = d.rechunk((10, 10, 10))
    assert_eq(y, np.cumsum(x))
    z = y.rechunk((2,) * 15)
    assert_eq(z, np.cumsum(x))


def test_rechunk_negative_like_spec(rng):
    x = rng.standard_normal((16, 8))
    d = da.from_array(x, chunks=4)
    y = d.rechunk((-1, 8))  # -1 = single chunk
    assert y.chunks == ((16,), (8,))
    assert_eq(y, x)


def test_rechunk_auto_spec(rng):
    x = rng.standard_normal((16, 8))
    d = da.from_array(x, chunks=2)
    y = d.rechunk("auto")
    assert_eq(y, x)


def test_rechunk_balance(rng):
    x = rng.standard_normal((10,))
    d = da.from_array(x, chunks=(7, 3))
    y = d.rechunk(5, balance=True)
    assert y.chunks == ((5, 5),)
    assert_eq(y, x)


# -- sharing gates ------------------------------------------------------------


def test_rechunk_not_pushed_into_shared_node(rng):
    x = rng.standard_normal((16,))
    base = da.from_array(x, chunks=4) + 1
    r = base.rechunk(8)
    other = base * 2
    out = r.sum() + other.sum()
    opt = out.expr.simplify()
    # the shared elemwise must not be duplicated into two layouts
    from dask_array_tpu._blockwise import Elemwise

    adds = [n for n in opt.walk() if isinstance(n, Elemwise)]
    assert_eq(out, (x + 1).sum() * 3)


def test_two_rechunks_of_shared_leaf_still_correct(rng):
    x = rng.standard_normal((24,))
    d = da.from_array(x, chunks=4)
    out = d.rechunk(6).cumsum() + d.rechunk(8).cumsum()
    assert_eq(out, 2 * np.cumsum(x))


# -- concatenate ----------------------------------------------------------------


def test_rechunk_through_concatenate_concat_axis(rng):
    x = rng.standard_normal((8, 6))
    y = rng.standard_normal((8, 6))
    c = da.concatenate(
        [da.from_array(x, chunks=4), da.from_array(y, chunks=4)], axis=0
    )
    r = c.rechunk((8, 6))
    assert_eq(r, np.concatenate([x, y]))
    assert r.chunks == ((8, 8), (6,))


def test_rechunk_through_concatenate_other_axis(rng):
    x = rng.standard_normal((6, 8))
    y = rng.standard_normal((6, 8))
    c = da.concatenate(
        [da.from_array(x, chunks=(3, 4)), da.from_array(y, chunks=(3, 4))], axis=0
    )
    r = c.rechunk({1: 8})
    assert_eq(r, np.concatenate([x, y]))


def test_rechunk_seam_crossing_values(rng):
    # target chunks crossing the concat seam must stay exact
    x = rng.standard_normal((5, 4))
    y = rng.standard_normal((7, 4))
    c = da.concatenate([da.from_array(x, chunks=5), da.from_array(y, chunks=7)], axis=0)
    r = c.rechunk((4, 4))
    assert_eq(r, np.concatenate([x, y]))


# -- slice composition ----------------------------------------------------------


def test_rechunk_composes_with_offgrid_slice(rng):
    x = rng.standard_normal((40,))
    d = da.from_array(x, chunks=10)
    y = d[3:37].rechunk(17)
    opt = y.expr.simplify()
    assert no_rechunk(opt), opt.tree_repr()  # absorbed into the leaf read
    assert_eq(y, x[3:37])


def test_rechunk_after_integer_axis_drop(rng):
    x = rng.standard_normal((10, 20))
    d = da.from_array(x, chunks=5)
    y = d[3].rechunk(10)
    assert_eq(y, x[3])
    assert y.chunks == ((10, 10),)


def test_rechunk_slice_steps_decline_still_correct(rng):
    x = rng.standard_normal((30,))
    d = da.from_array(x, chunks=5)
    y = d[::2].rechunk(5)
    assert_eq(y, x[::2])


def test_rechunk_zero_size(rng):
    x = rng.standard_normal((10,))
    d = da.from_array(x, chunks=5)
    y = d[0:0].rechunk(1)
    assert np.asarray(y.compute()).shape == (0,)


# -- lower-inserted alignment rechunks -------------------------------------------


def test_misaligned_elemwise_unifies_and_absorbs(rng):
    x = rng.standard_normal((24,))
    a = da.from_array(x, chunks=6)
    b = da.from_array(x, chunks=8)
    y = a + b
    lowered = y.expr.optimize(fuse=False)
    # the alignment rechunk was inserted AND pushed into a leaf read
    assert no_rechunk(lowered), lowered.tree_repr()
    assert_eq(y, 2 * x)


def test_misaligned_three_way(rng):
    x = rng.standard_normal((24, 12))
    a = da.from_array(x, chunks=(6, 6))
    b = da.from_array(x, chunks=(8, 12))
    c = da.from_array(x, chunks=(12, 4))
    y = a + b + c
    assert_eq(y, 3 * x)


def test_rechunk_then_reduction_values(rng):
    x = rng.standard_normal((36, 36))
    d = da.from_array(x, chunks=6)
    y = d.rechunk(12).sum(axis=0)
    assert_eq(y, x.sum(axis=0))


def test_rechunk_after_computed_node_survives(rng):
    # a rechunk above a scan cannot be absorbed: it must survive lowering
    x = rng.standard_normal((24,))
    d = da.from_array(x, chunks=6)
    y = d.cumsum().rechunk(12)
    lowered = y.expr.optimize(fuse=False)
    assert any(isinstance(n, Rechunk) for n in lowered.walk()), lowered.tree_repr()
    assert_eq(y, np.cumsum(x))


def test_unknown_chunks_rechunk_raises_or_defers(rng):
    x = rng.standard_normal((20,))
    d = da.from_array(x, chunks=5)
    m = d[da.from_array(x > 0, chunks=5)]
    resolved = m.compute_chunk_sizes().rechunk(4)
    assert_eq(resolved, x[x > 0])


# -- roll realignment (parity: test_roll_sliver_realigns...) ---------------------


def test_roll_small_shift_values(rng):
    x = rng.standard_normal((40,))
    d = da.from_array(x, chunks=10)
    y = da.roll(d, 1)
    assert_eq(y, np.roll(x, 1))


def test_roll_half_chunk_shift(rng):
    x = rng.standard_normal((40, 8))
    d = da.from_array(x, chunks=(10, 8))
    y = da.roll(d, 5, axis=0) + d
    assert_eq(y, np.roll(x, 5, axis=0) + x)


def test_roll_into_reduction(rng):
    x = rng.standard_normal((30,))
    d = da.from_array(x, chunks=10)
    assert_eq(da.roll(d, 7).sum(), np.roll(x, 7).sum())


# -- storage-chunk discipline (reference :196-461, round 3) -------------------


class RecordingStore:
    """zarr/h5py-style chunked source: .chunks granules, recorded reads."""

    def __init__(self, shape, chunks, shards=None):
        self.data = np.arange(np.prod(shape), dtype="f8").reshape(shape)
        self.shape = shape
        self.dtype = self.data.dtype
        self.chunks = chunks
        self.calls = []
        if shards:
            self.shards = shards
        self.ndim = len(shape)

    def __getitem__(self, sl):
        self.calls.append(sl)
        return self.data[sl]


def test_rechunk_pushdown_does_not_split_storage_chunks():
    st = RecordingStore((10, 10), (10, 10))
    y = da.from_array(st, chunks=st.chunks).rechunk((2, 2))
    assert y.chunks == ((2,) * 5, (2,) * 5)
    # the leaf keeps reading at storage granularity; fine rechunk outside
    assert leaf_chunks(y.expr.simplify()) == [((10,), (10,))]
    st.calls.clear()
    np.testing.assert_array_equal(y.compute(), st.data)
    # dense executor: ONE bulk read (each granule touched exactly once)
    assert st.calls == [(slice(None), slice(None))]


def test_rechunk_pushdown_refines_coarse_source_chunks_to_storage_chunks():
    st = RecordingStore((20, 30), (10, 10))
    y = da.from_array(st, chunks=(20, 30)).rechunk((2, 2))
    assert y.chunks == ((2,) * 10, (2,) * 15)
    assert leaf_chunks(y.expr.simplify()) == [((10, 10), (10, 10, 10))]
    np.testing.assert_array_equal(y.compute(), st.data)


def test_rechunk_pushdown_respects_storage_shards_over_chunks():
    st = RecordingStore((20, 20), (2, 2), shards=(10, 10))
    y = da.from_array(st, chunks=(20, 20)).rechunk((2, 2))
    assert leaf_chunks(y.expr.simplify()) == [((10, 10), (10, 10))]
    np.testing.assert_array_equal(y.compute(), st.data)


def test_rechunk_pushdown_eliminates_storage_aligned_rechunk():
    st = RecordingStore((20, 30), (10, 10))
    y = da.from_array(st, chunks=(10, 10)).rechunk((20, 10))
    simplified = y.expr.simplify()
    assert isinstance(simplified, FromArray)  # fully absorbed, no Rechunk
    np.testing.assert_array_equal(y.compute(), st.data)


def test_rechunk_pushdown_through_offset_region_pushes_other_axes():
    st = RecordingStore((20, 30), (10, 10))
    x = da.from_array(st, chunks=(10, 10))
    y = x[3:17].rechunk((2, 10))  # offset region: axis 0 misaligned
    np.testing.assert_array_equal(y.compute(), st.data[3:17])
    # cols stay absorbable; rows read at granule-aligned pieces
    leafs = leaf_chunks(y.expr.simplify())
    assert leafs and leafs[0][1] == (10, 10, 10)


def test_storage_chunks_survive_lower_inserted_rechunk():
    # misaligned elemwise operands: lowering inserts an alignment rechunk,
    # which must respect the storage granules too
    st = RecordingStore((20, 20), (10, 10))
    a = da.from_array(st, chunks=(10, 10))
    b = da.from_array(np.ones((20, 20)), chunks=(4, 4))
    out = a + b
    np.testing.assert_array_equal(out.compute(), st.data + 1.0)


# -- multistep / concat seams (reference :580,799-876) ------------------------


def test_rechunk_multistep_no_cycle(rng):
    x = rng.standard_normal((24, 24))
    d = da.from_array(x, chunks=(6, 6))
    r = d.rechunk((8, 8)).rechunk((12, 12)).rechunk((4, 4))
    simplified = r.expr.simplify()
    # rechunk-of-rechunk collapses to ONE boundary (absorbed by the leaf)
    assert sum(1 for n in simplified.walk() if isinstance(n, Rechunk)) == 0
    assert_eq(r, x)


def test_rechunk_through_concatenate_multi_part_axis1(rng):
    parts_np = [rng.standard_normal((6, 5)) for _ in range(3)]
    parts = [da.from_array(p, chunks=(3, 5)) for p in parts_np]
    c = da.concatenate(parts, axis=1).rechunk((6, 5))
    assert_eq(c, np.concatenate(parts_np, axis=1))


def test_rechunk_through_concatenate_seam_only_declines(rng):
    # a rechunk whose boundaries cross part seams cannot push into parts;
    # values must still be exact
    a = rng.standard_normal((4, 6))
    b = rng.standard_normal((5, 6))
    c = da.concatenate(
        [da.from_array(a, chunks=(2, 3)), da.from_array(b, chunks=(5, 3))], axis=0
    ).rechunk((3, 6))
    assert_eq(c, np.concatenate([a, b], axis=0))


def test_rechunks_not_pushed_into_node_shared_by_rechunks(rng):
    # TWO different rechunk consumers of one computed node: pushing either
    # would duplicate the chain
    x = rng.standard_normal((12, 12))
    d = da.from_array(x, chunks=(3, 3))
    y = (d + 1).cumsum(axis=0)
    z = y.rechunk((6, 6)).sum() + y.rechunk((4, 4)).sum()
    want = np.cumsum(x + 1, axis=0)
    np.testing.assert_allclose(z.compute(), want.sum() + want.sum(), rtol=1e-10)


# -- rechunk ∘ slice composition (reference :876-1105) ------------------------


def test_rechunk_slice_composition_does_not_push_into_shared_leaf(rng):
    x = rng.standard_normal((40, 40))
    d = da.from_array(x, chunks=(10, 10))
    z = d[:35].rechunk((7, 10)).sum() + d.sum()
    froms = {n._name for n in z.expr.simplify().walk() if isinstance(n, FromArray)}
    assert len(froms) == 1  # the leaf stays shared
    np.testing.assert_allclose(z.compute(), x[:35].sum() + x.sum(), rtol=1e-10)


def test_rechunk_slice_composition_multi_axis(rng):
    x = rng.standard_normal((30, 24))
    d = da.from_array(x, chunks=(6, 6))
    r = d[2:26, 3:21].rechunk((8, 9))
    assert_eq(r, x[2:26, 3:21])


def test_rechunk_slice_composition_declines_integers_and_steps(rng):
    x = rng.standard_normal((20, 16))
    d = da.from_array(x, chunks=(5, 4))
    r1 = d[::2, :].rechunk((5, 8))
    assert_eq(r1, x[::2, :])
    r2 = d[3, :].rechunk((8,))
    assert_eq(r2, x[3, :])


def test_rechunk_pushes_through_expand_dims_and_composes_with_slice(rng):
    x = rng.standard_normal((12, 8))
    d = da.from_array(x, chunks=(4, 4))
    r = da.expand_dims(d, 1)[2:10].rechunk((4, 1, 8))
    assert_eq(r, np.expand_dims(x, 1)[2:10])


def test_rechunk_zero_target_chunks_edge(rng):
    x = rng.standard_normal((6, 0))
    d = da.from_array(x, chunks=((3, 3), (0,)))
    r = d.rechunk((6, 0))
    assert_eq(r, x)


# -- recursive bounded-degree planner (reference :395-562, round 3) ----------


def _plan_degrees(old, new, threshold):
    from dask_array_tpu._rechunk import _stage_degree, plan_rechunk

    stages = plan_rechunk(old, new, threshold=threshold)
    degs, prev = [], old
    for st in stages:
        degs.append(_stage_degree(prev, st))
        prev = st
    return stages, degs


def test_plan_rechunk_bounded_merge_degree():
    stages, degs = _plan_degrees(((1,) * 1024,), ((1024,),), threshold=4)
    assert stages[-1] == ((1024,),)
    assert all(d <= 4 for d in degs)
    assert len(stages) == 5  # log_4(1024)


def test_plan_rechunk_mixed_split_merge():
    old = ((100,) * 10, (1,) * 64)
    new = ((50,) * 20, (64,))
    stages, degs = _plan_degrees(old, new, threshold=8)
    assert stages[-1] == new
    assert all(d <= 8 for d in degs)
    # every stage preserves the total extent
    for st in stages:
        assert tuple(sum(c) for c in st) == (1000, 64)


def test_plan_rechunk_irregular_boundaries():
    old = ((3, 7, 5, 5, 4, 8, 8),)
    new = ((20, 20),)
    stages, degs = _plan_degrees(old, new, threshold=2)
    assert stages[-1] == new
    assert all(d <= 2 for d in degs)


def test_plan_rechunk_cheap_single_stage():
    from dask_array_tpu._rechunk import plan_rechunk

    assert plan_rechunk(((4, 4),), ((8,),), threshold=32) == [((8,),)]
    # pure split: one stage regardless of width
    assert plan_rechunk(((1024,),), ((1,) * 1024,), threshold=4) == [((1,) * 1024,)]
