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


# -- dict/tuple equivalence & no-op identity (reference :156-193,571) ----------


def test_rechunk_dict_correctness(rng):
    x = rng.standard_normal((10, 10))
    d = da.from_array(x, chunks=(5, 5))
    rt = d.rechunk((2, 3))
    rd = d.rechunk({0: 2, 1: 3})
    assert rt.expr._name == rd.expr._name  # same plan, not just same values
    assert_eq(rt, x)
    assert_eq(rd, x)


def test_rechunk_dict_through_elemwise_correctness(rng):
    x = rng.standard_normal((10, 10))
    y = rng.standard_normal((10, 10))
    a = da.from_array(x, chunks=(5, 5))
    b = da.from_array(y, chunks=(5, 5))
    rt = (a + b).rechunk((2, 3))
    rd = (a + b).rechunk({0: 2, 1: 3})
    assert rt.expr._name == rd.expr._name
    assert_eq(rt, x + y)


def test_rechunk_noop_negative_index(rng):
    d = da.from_array(rng.standard_normal((10, 10)), chunks=5)
    assert d.rechunk({-1: 5, -2: 5}).expr._name == d.expr._name


def test_rechunk_none_axes_keep_existing(rng):
    x = rng.standard_normal((10, 10))
    d = da.from_array(x, chunks=5)
    y = d.rechunk((None, 2))
    assert y.chunks == ((5, 5), (2, 2, 2, 2, 2))
    assert d.rechunk((None, None)).expr._name == d.expr._name
    assert_eq(y, x)


def test_rechunk_dict_negative_key_out_of_range(rng):
    d = da.from_array(rng.standard_normal((10,)), chunks=5)
    with pytest.raises(ValueError, match="out of range"):
        d.rechunk({-2: 5})


# -- structural name equality through transpose (reference :487-543) -----------


def test_rechunk_through_transpose_3d_name_equality(rng):
    x = da.ones((2, 3, 4), chunks=(1, 1, 2))
    # output axis i <- input axis (2, 0, 1)[i]; pushing maps target chunks back
    result = x.transpose((2, 0, 1)).rechunk((2, 1, 3))
    expected = x.rechunk((1, 3, 2)).transpose((2, 0, 1))
    assert result.expr.simplify()._name == expected.expr.simplify()._name


def test_rechunk_through_transpose_simple_name_equality(rng):
    x = da.from_array(rng.standard_normal((3, 4)), chunks=(1, 2))
    result = x.T.rechunk((2, 3))
    expected = x.rechunk((3, 2)).T
    assert result.expr.simplify()._name == expected.expr.simplify()._name


def test_rechunk_through_transpose_dict_name_equality(rng):
    x = da.ones((2, 3, 4), chunks=(1, 1, 2))
    result = x.transpose((2, 0, 1)).rechunk({0: 2})
    expected = x.rechunk({2: 2}).transpose((2, 0, 1))
    assert result.expr.simplify()._name == expected.expr.simplify()._name


# -- sharing gates, leaf and inner-rechunk forms (reference :605-680) ----------


def test_rechunk_not_pushed_into_shared_leaf(rng):
    # pushing the rechunk into a shared FromArray would read the source
    # twice (once per layout); it must stay above the shared read
    x = rng.standard_normal((40, 40))
    d = da.from_array(x, chunks=(10, 10))
    z = d.sum() + d.rechunk((20, 20)).sum()
    simplified = z.expr.simplify()
    froms = {n._name for n in simplified.walk() if isinstance(n, FromArray)}
    assert len(froms) == 1
    assert any(isinstance(n, Rechunk) for n in simplified.walk())
    np.testing.assert_allclose(z.compute(), 2 * x.sum(), rtol=1e-10)


def test_rechunk_fusion_not_through_shared_inner_rechunk(rng):
    # Rechunk(Rechunk) collapse must decline when the inner rechunk is
    # shared: collapsing past it de-shares its output and duplicates the
    # upstream read (reference :663)
    x = rng.standard_normal((40, 40))
    d = da.from_array(x, chunks=(10, 10))
    y = d.rechunk((20, 20))
    z = y[:5].sum() + y.rechunk((40, 40)).sum()
    simplified = z.expr.simplify()
    froms = {n._name for n in simplified.walk() if isinstance(n, FromArray)}
    assert len(froms) == 1
    np.testing.assert_allclose(z.compute(), x[:5].sum() + x.sum(), rtol=1e-10)


def test_rechunk_shared_chain_not_duplicated(rng):
    # reference :605 — the shared elemwise chain appears once in the plan:
    # add + mul + the top-level add of the two sums, never five
    from dask_array_tpu._blockwise import Elemwise

    x = rng.standard_normal((40, 40))
    d = da.from_array(x, chunks=(10, 10))
    y = (d + 1) * 2
    z = y[:5].sum() + y.rechunk((20, 20)).sum()
    simplified = z.expr.simplify()
    n_elemwise = sum(1 for n in simplified.walk() if isinstance(n, Elemwise))
    assert n_elemwise == 3, simplified.tree_repr()
    yn = (x + 1) * 2
    np.testing.assert_allclose(z.compute(), yn[:5].sum() + yn.sum(), rtol=1e-10)


# -- roll / realign read-grid quality (reference :741-797) ---------------------


def test_roll_rechunk_on_io_reads_shifted_regions(rng):
    # roll(io, s).rechunk(y.chunks): the roll's slices push into the reads,
    # so the two leaves read exactly the shifted regions; one residual
    # rechunk realigns the seam
    data = np.arange(1000.0)
    y = da.from_array(data, chunks=100)
    r = da.roll(y, 30).rechunk(y.chunks)
    assert r.chunks == y.chunks
    opt = r.expr.optimize(fuse=False)
    assert sorted(leaf_chunks(opt)) == [((30,),), ((100,) * 9 + (70,),)]
    assert sum(1 for n in opt.walk() if isinstance(n, Rechunk)) == 1
    assert_eq(r, np.roll(data, 30))


def test_realign_roll_on_io_reads_shifted_regions(rng):
    # z + roll(y, s): unification inserts the realign at lower time; y's
    # reads absorb the roll's slices (y's only consumers), z's read stays
    zdata = np.arange(2000.0)
    ydata = np.arange(2000.0, 4000.0)
    z = da.from_array(zdata, chunks=200)
    y = da.from_array(ydata, chunks=200)
    r = z + da.roll(y, 60)
    assert r.chunks == z.chunks
    opt = r.expr.optimize(fuse=False)
    assert sorted(leaf_chunks(opt)) == [
        ((60,),),
        ((200,) * 9 + (140,),),
        ((200,) * 10,),
    ]
    assert sum(1 for n in opt.walk() if isinstance(n, Rechunk)) == 1
    assert_eq(r, zdata + np.roll(ydata, 60))


def test_realign_roll_on_shared_io_keeps_single_reads(rng):
    # y + roll(y, s): y feeds the elemwise whole, so the sharing gate
    # declines pushing the roll's slices into y — the source is read once
    data = np.arange(1600.0)
    y = da.from_array(data, chunks=160)
    r = y + da.roll(y, 48)
    opt = r.expr.optimize(fuse=False)
    froms = {n._name for n in opt.walk() if isinstance(n, FromArray)}
    assert len(froms) == 1
    assert leaf_chunks(opt) == [((160,) * 10,)]
    assert sum(1 for n in opt.walk() if isinstance(n, Rechunk)) == 1
    assert_eq(r, data + np.roll(data, 48))


# -- concatenate declines (reference :799-851) ---------------------------------


def test_rechunk_through_concatenate_opaque_parts_declines(rng):
    # no part can absorb its rechunk into reads (random leaves): pushing
    # would trade one rechunk for one per part plus a seam merge
    a = da.random.random((26,), chunks=13)
    b = da.random.random((26,), chunks=13)
    y = da.concatenate([a, b]).rechunk(8)
    assert y.chunks == ((8,) * 6 + (4,),)
    opt = y.expr.optimize(fuse=False)
    assert sum(1 for n in opt.walk() if isinstance(n, Rechunk)) == 1
    assert_eq(y, da.concatenate([a, b]))


def test_rechunk_through_concatenate_declines_without_absorption():
    # storage-chunked parts gain nothing from redistribution: their reads
    # stay granule-aligned regardless, so one rechunk stays above
    st = RecordingStore((24, 3), (6, 3))
    part = da.from_array(st, chunks=(6, 3))
    y = da.concatenate([part, part], axis=0).rechunk((9, 3))
    opt = y.expr.optimize(fuse=False)
    assert sum(1 for n in opt.walk() if isinstance(n, Rechunk)) == 1
    assert leaf_chunks(opt) == [((6, 6, 6, 6), (3,))]
    np.testing.assert_array_equal(
        y.compute(), np.concatenate([st.data, st.data])
    )


# -- slice composition, shared/aligned/axis-drop forms (reference :950-1061) ---


def test_rechunk_slice_composition_does_not_push_into_shared_concatenate(rng):
    left_np = np.arange(40.0)
    right_np = np.arange(40.0, 80.0)
    left = da.from_array(left_np, chunks=8)
    right = da.from_array(right_np, chunks=8)
    x = da.concatenate([left, right])
    z = x[7:73].rechunk(8).sum() + x.sum()
    simplified = z.expr.simplify()
    froms = {n._name for n in simplified.walk() if isinstance(n, FromArray)}
    assert len(froms) == 2  # both sources read exactly once
    both = np.concatenate([left_np, right_np])
    np.testing.assert_allclose(z.compute(), both[7:73].sum() + both.sum(), rtol=1e-10)


def test_rechunk_does_not_compose_with_aligned_slice(rng):
    # a slice already on x's grid is pure block selection; its rechunk to
    # the same grid is a no-op and must vanish outright
    a = rng.standard_normal((40, 6))
    x = da.from_array(a, chunks=(8, 6)) + 0
    y = x[8:32].rechunk((8, 6))
    opt = y.expr.simplify()
    assert not any(isinstance(n, Rechunk) for n in opt.walk())
    assert_eq(y, (a + 0)[8:32])


def test_rechunk_slice_composition_with_integer_axis_drop(rng):
    # off-grid range mixed with an integer index still composes and stays
    # exact; the dropped axis vanishes from the output grid
    a = rng.standard_normal((40, 6, 2))
    x = da.from_array(a, chunks=(8, 6, 1)) + 0
    y = x[7:39, :, 0].rechunk((8, 6))
    assert y.chunks == ((8, 8, 8, 8), (6,))
    assert_eq(y, (a + 0)[7:39, :, 0])


def test_rechunk_slice_composition_heavy_trim_still_correct(rng):
    # keep-tiny slice of a huge block column (2 of 500 blocks kept): the
    # composition may decline, but values must stay exact
    big_np = np.arange(4000.0)[:, None]
    big = da.from_array(big_np, chunks=(8, 1)) + 0
    z = big[3:19].rechunk((16, 1))
    assert z.chunks == ((16,), (1,))
    assert_eq(z, (big_np + 0)[3:19])


# -- storage chunks through wrappers and real stores (reference :263-368) ------


class LazyWrapper:
    """xarray-style lazy-indexing adapter: hides the store's .chunks
    behind .array (reference _LazyIndexingAdapter)."""

    def __init__(self, array):
        self.array = array

    @property
    def shape(self):
        return self.array.shape

    @property
    def dtype(self):
        return self.array.dtype

    @property
    def ndim(self):
        return self.array.ndim

    def __getitem__(self, sl):
        return self.array[sl]


def test_rechunk_pushdown_sees_storage_chunks_through_lazy_wrapper():
    # regression the reference guards: keying storage detection on the
    # direct .chunks attr only means the wrapper fuses the rechunk below
    # the native grid and amplifies reads
    st = RecordingStore((20, 30), (10, 10))
    wrapped = LazyWrapper(st)
    assert not hasattr(wrapped, "chunks")  # precondition: grid is hidden
    x = da.from_array(wrapped, chunks=(10, 10))
    y = x.rechunk((2, 2))
    simplified = y.expr.simplify()
    assert isinstance(simplified, Rechunk)
    assert leaf_chunks(simplified) == [((10, 10), (10, 10, 10))]
    st.calls.clear()
    np.testing.assert_array_equal(y.compute(), st.data)
    assert st.calls == [(slice(None), slice(None))]  # one bulk read


def test_from_array_auto_chunks_through_lazy_wrapper():
    # from_array's default grid aligns to the hidden storage granules too
    st = RecordingStore((20, 30), (10, 10))
    x = da.from_array(LazyWrapper(st))
    for dim, g in zip(x.chunks, (10, 10)):
        for c in dim[:-1]:
            assert c % g == 0


def test_rechunk_pushdown_respects_zarr_storage_chunks(tmp_path):
    # a real (vendored-lite) zarr array: coarse from_array + sub-native
    # rechunk keeps the leaf at the native storage grid
    from dask_array_tpu.io._zarr_lite import ZarrLiteArray

    data = np.arange(20.0 * 30.0).reshape(20, 30)
    z = ZarrLiteArray.create(str(tmp_path / "z"), (20, 30), "f8", (10, 10))
    z[:, :] = data
    x = da.from_array(z, chunks=(20, 30))
    y = x.rechunk((2, 2))
    simplified = y.expr.simplify()
    assert y.chunks == ((2,) * 10, (2,) * 15)
    assert leaf_chunks(simplified) == [((10, 10), (10, 10, 10))]
    np.testing.assert_array_equal(y.compute(), data)


def test_rechunk_pushdown_through_region_pushes_storage_compatible_axes():
    # region slice then rechunk: axes whose target boundaries land on
    # storage granules (modulo the region offset) absorb; the offset axis
    # reads granule-aligned pieces
    st = RecordingStore((25, 10), (8, 2))
    x = da.from_array(st, chunks=(8, 2))
    y = x[1:17].rechunk((4, 4))
    simplified = y.expr.simplify()
    assert y.chunks == ((4, 4, 4, 4), (4, 4, 2))
    leafs = leaf_chunks(simplified)
    assert len(leafs) == 1
    # columns absorbed at (4,4,2) (granule-2-aligned); rows read at pieces
    # aligned to the granule grid in the SOURCE frame (offset 1)
    assert leafs[0][1] == (4, 4, 2)
    for c in np.cumsum(leafs[0][0])[:-1]:
        assert (1 + int(c)) % 8 == 0
    st.calls.clear()
    np.testing.assert_array_equal(y.compute(), st.data[1:17])


def test_rechunk_pushdown_through_region_preserves_values_and_storage_reads():
    st = RecordingStore((25, 10, 12), (8, 2, 3))
    x = da.from_array(st, chunks=(8, 2, 3))
    y = x[:10].rechunk((10, 4, 6))
    simplified = y.expr.simplify()
    assert y.chunks == ((10,), (4, 4, 2), (6, 6))
    leafs = leaf_chunks(simplified)
    assert len(leafs) == 1
    assert leafs[0][1] == (4, 4, 2) and leafs[0][2] == (6, 6)
    np.testing.assert_array_equal(y.compute(), st.data[:10])


def test_lower_inserted_rechunk_respects_storage_chunks_structural():
    # unification realigns the storage-chunked operand to its partner's
    # grid at LOWER time; the pushdown reads at storage multiples and one
    # residual rechunk stays above the read
    st = RecordingStore((20, 22), (3, 22))
    a = da.from_array(st, chunks=(3, 22))
    b = da.from_array(np.arange(20.0 * 22.0).reshape(20, 22), chunks=(4, 22))
    out = a + b
    opt = out.expr.optimize(fuse=False)
    n_rechunk = sum(1 for n in opt.walk() if isinstance(n, Rechunk))
    assert n_rechunk <= 1, opt.tree_repr()
    for leafs in leaf_chunks(opt):
        if leafs[0] != (4,) * 5:  # the storage-backed read
            for c in np.cumsum(leafs[0])[:-1]:
                assert int(c) % 3 == 0
    np.testing.assert_array_equal(out.compute(), st.data + b.compute())
