"""Transfer-byte cost-model battery.

Ports the case mass of the reference's ``tests/test_transfer.py`` (244 LoC,
22 cases) onto THIS framework's SPMD cost model.  The models differ by
design: the reference charges per-task fetches (its min/max brackets task
placement under a work-stealing scheduler), while here blockwise/slice/
concat/stack nodes are free (block-local under one XLA program) and the
movement nodes (Rechunk / Shuffle / Take / VIndex / OverlapInternal) carry
explicit (min, max) models:

- Rechunk: min = misaligned fraction (largest-piece-stays, reference
  ``_expr.py:675`` moved_fraction), max = whole array crosses once (the
  all-to-all bound).
- OverlapInternal: exact internal-seam halo bytes (min == max).
- Shuffle/Take: min 0 (could be co-located), max = gathered fraction.
- VIndex: min 0, max = whole source.
"""

import math

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._rechunk import Rechunk, _axis_moved_fraction, _moved_fraction
from dask_array_tpu._test_utils import assert_eq


def _walk_unique(expr):
    seen = set()
    stack = [expr]
    while stack:
        e = stack.pop()
        if e._name in seen:
            continue
        seen.add(e._name)
        yield e
        stack.extend(d for d in e.dependencies() if hasattr(d, "chunks"))


# -- free nodes (block-local under one XLA program) ---------------------------


def test_leaves_are_free():
    assert da.ones((10,), chunks=5).expr.transfer_bytes() == (0, 0)
    assert da.from_array(np.ones(10), chunks=5).expr.transfer_bytes() == (0, 0)


def test_elemwise_aligned_is_free():
    x = da.ones((10, 10), chunks=(5, 5))
    y = da.zeros((10, 10), chunks=(5, 5))
    assert (x + y).expr.transfer_bytes() == (0, 0)


def test_elemwise_broadcast_is_free():
    # broadcast replication is a sharding constraint, not a transfer, under
    # SPMD: the replicated operand is laid out once per device by GSPMD
    x = da.ones((10, 10), chunks=(5, 5))
    y = da.ones((10, 1), chunks=(5, 1))
    assert (x + y).expr.transfer_bytes() == (0, 0)


def test_duplicate_operand_counts_once():
    x = da.ones((10,), chunks=5)
    assert (x + x).expr.transfer_bytes() == (x + 1).expr.transfer_bytes() == (0, 0)


def test_slice_within_blocks_free():
    x = da.ones((10,), chunks=5)
    assert x[2:].expr.transfer_bytes() == (0, 0)


def test_concatenate_is_alias_routing():
    x = da.ones((10,), chunks=5)
    y = da.ones((10,), chunks=5)
    assert da.concatenate([x, y]).expr.transfer_bytes() == (0, 0)


def test_stack_partitions_output():
    xs = [da.ones((10,), chunks=5) for _ in range(4)]
    assert da.stack(xs).expr.transfer_bytes() == (0, 0)


# -- rechunk: moved-fraction min, all-to-all max ------------------------------


def test_rechunk_aligned_merge():
    x = da.ones((10,), chunks=5)
    r = x.rechunk((10,)).expr
    assert isinstance(r, Rechunk)
    lo, hi = r.transfer_bytes()
    # merging two equal blocks: the largest piece stays, the other half moves
    assert lo == x.nbytes / 2
    assert hi == x.nbytes


def test_rechunk_jittered_sliver():
    x = da.ones((10,), chunks=((4, 6),))
    lo, hi = x.rechunk(((5, 5),)).expr.transfer_bytes()
    # new[0:5) keeps old0's 4 elements, fetches 1 from old1; new[5:10) stays
    assert lo == 1 * 8
    assert hi == x.nbytes


def test_rechunk_pure_split_min_free():
    x = da.ones((10,), chunks=10)
    lo, hi = x.rechunk(5).expr.transfer_bytes()
    # splits are cut at the source: nothing must move under min
    assert lo == 0
    assert hi == x.nbytes


def test_rechunk_identity_is_simplified_away():
    x = da.from_array(np.ones(10), chunks=5)
    assert x.rechunk(5).expr.simplify()._name == x.expr._name


def test_rechunk_identity_node_min_zero():
    # a hand-built no-op Rechunk (bypassing simplify) still reports min 0
    x = da.ones((10,), chunks=5)
    node = Rechunk(x.expr, ((5, 5),))
    lo, hi = node.transfer_bytes()
    assert lo == 0
    assert hi == x.nbytes  # the max model stays the all-to-all bound


def test_rechunk_2d_stay_fraction_is_product():
    # an element stays only if it stays along EVERY axis
    x = da.ones((10, 10), chunks=(5, 5))
    lo_one, _ = x.rechunk((10, 5)).expr.transfer_bytes()
    lo_both, _ = x.rechunk((10, 10)).expr.transfer_bytes()
    assert lo_one == x.nbytes * 0.5
    assert lo_both == x.nbytes * 0.75  # 1 - 0.5 * 0.5


def test_axis_moved_fraction_cases():
    assert _axis_moved_fraction((5, 5), (10,)) == 0.5
    assert _axis_moved_fraction((10,), (5, 5)) == 0.0  # splits free
    assert _axis_moved_fraction((4, 6), (5, 5)) == pytest.approx(0.1)
    assert _axis_moved_fraction((5, 5), (5, 5)) == 0.0
    # merge of unequal runs: largest member stays
    assert _axis_moved_fraction((2, 8), (10,)) == pytest.approx(0.2)


def test_moved_fraction_empty_axis():
    assert _moved_fraction(((0,),), ((0,),)) == 0.0


def test_rechunk_unknown_chunks_zero():
    x = da.from_array(np.arange(100), chunks=10)
    m = x[x > 2]  # unknown chunk sizes
    node = Rechunk(m.expr, ((float("nan"),) * 10,))
    assert node.transfer_bytes() == (0, 0)


# -- overlap: exact internal-seam halo bytes ----------------------------------


def test_overlap_ghost_cells_2d():
    from dask_array_tpu.ops._overlap import Overlap as OverlapInternal

    x = da.ones((10, 4), chunks=(5, 4))
    o = OverlapInternal(x.expr, ((1, 1), (0, 0)), ("none", "none"))
    lo, hi = o.transfer_bytes()
    # one internal boundary on axis 0, (1+1) hyperplanes of 4 float64s
    assert lo == hi == 2 * 4 * 8


def test_overlap_asymmetric_depth():
    from dask_array_tpu.ops._overlap import Overlap as OverlapInternal

    x = da.ones((12, 4), chunks=(4, 4))  # 3 blocks -> 2 internal seams
    o = OverlapInternal(x.expr, ((2, 1), (0, 0)), ("none", "none"))
    lo, hi = o.transfer_bytes()
    assert lo == hi == (2 + 1) * 2 * 4 * 8


def test_overlap_multi_axis_sums():
    from dask_array_tpu.ops._overlap import Overlap as OverlapInternal

    x = da.ones((10, 10), chunks=(5, 5))
    o = OverlapInternal(x.expr, ((1, 1), (1, 1)), ("none", "none"))
    lo, hi = o.transfer_bytes()
    # per axis: 2 hyperplanes x 1 seam x 10 other-extent x 8 bytes
    assert lo == hi == 2 * (2 * 1 * 10 * 8)


def test_overlap_single_block_axis_free():
    from dask_array_tpu.ops._overlap import Overlap as OverlapInternal

    x = da.ones((10, 10), chunks=(10, 10))
    o = OverlapInternal(x.expr, ((1, 1), (0, 0)), ("none", "none"))
    assert o.transfer_bytes() == (0, 0)  # no internal seams


# -- shuffle / take: gathered-fraction max ------------------------------------


def test_shuffle_full_permutation_bytes():
    x = da.from_array(np.ones(100), chunks=10)
    sh = x.shuffle([list(range(50)), list(range(50, 100))], axis=0)
    lo, hi = sh.expr.transfer_bytes()
    assert (lo, hi) == (0, 100 * 8)


def test_shuffle_subset_charges_fraction():
    x = da.from_array(np.ones(100), chunks=10)
    sh = x.shuffle([list(range(25))], axis=0)
    lo, hi = sh.expr.transfer_bytes()
    assert (lo, hi) == (0, 25 * 8)


def test_shuffle_duplicates_charge_expansion():
    x = da.from_array(np.ones(10), chunks=5)
    sh = x.shuffle([[0, 0, 0, 0, 0], [1, 1, 1, 1, 1], [2] * 10], axis=0)
    lo, hi = sh.expr.transfer_bytes()
    assert (lo, hi) == (0, 20 * 8)  # 20 gathered elements from a 10-element axis


def test_take_charges_taken_fraction():
    from dask_array_tpu.ops._fancy_indexing import Take

    x = da.from_array(np.ones((10, 4)), chunks=(5, 4))
    t = x[np.array([1, 2, 3]), :]
    takes = [e for e in _walk_unique(t.expr) if isinstance(e, Take)]
    assert takes, t.expr.tree_repr()
    lo, hi = takes[0].transfer_bytes()
    assert lo == 0
    assert hi == int(x.nbytes * 3 / 10)


def test_vindex_charges_whole_source_max():
    x = da.from_array(np.ones((10, 10)), chunks=5)
    v = x.vindex[np.array([1, 5, 9]), np.array([0, 4, 8])]
    nodes = [e for e in _walk_unique(v.expr) if type(e).__name__ == "VIndex"]
    assert nodes
    lo, hi = nodes[0].transfer_bytes()
    assert lo == 0
    assert hi == x.nbytes


# -- graph-wide sanity ---------------------------------------------------------


def _assert_sane(expr):
    for node in _walk_unique(expr):
        lo, hi = node.transfer_bytes()
        assert not (isinstance(lo, float) and math.isnan(lo)), type(node).__name__
        assert not (isinstance(hi, float) and math.isnan(hi)), type(node).__name__
        assert 0 <= lo <= hi, (type(node).__name__, lo, hi)


def test_graph_wide_sanity(rng):
    x = da.from_array(rng.standard_normal((100, 8)), chunks=(10, 4))
    y = da.map_overlap(lambda b: b, x, depth=(2, 0), boundary="reflect")
    z = (x * y) - y.mean(axis=1, keepdims=True)
    r = z.rechunk((50, 4))[3:].sum()
    _assert_sane(r.expr.simplify())
    _assert_sane(r.expr.optimize())


def test_graph_wide_sanity_fused(rng):
    x = da.from_array(rng.standard_normal((100, 8)), chunks=(10, 4))
    z = da.log(da.absolute(x) + 1) * x
    _assert_sane(z.expr.optimize())
    assert z.expr.optimize().transfer_bytes() == (0, 0)  # fused group is free


def test_graph_wide_sanity_unknown_chunks(rng):
    x = da.from_array(rng.standard_normal(100), chunks=10)
    m = x[x > 0]
    r = (m * 2).sum()
    _assert_sane(r.expr.optimize())


def test_explain_totals_cover_every_movement_node(rng):
    import io

    x = da.from_array(rng.standard_normal((40, 40)), chunks=10)
    y = da.overlap(x.rechunk(20), depth=1, boundary="none")
    info = da.explain(y, file=io.StringIO())
    lo, hi = info["transfer_bytes"]
    opt = y.expr.optimize()
    parts_lo = sum(n.transfer_bytes()[0] for n in _walk_unique(opt))
    parts_hi = sum(n.transfer_bytes()[1] for n in _walk_unique(opt))
    assert lo == parts_lo
    assert hi == parts_hi
    assert hi >= lo > 0


def test_transfer_scales_with_itemsize():
    x8 = da.ones((10,), chunks=5, dtype="f8")
    x4 = da.ones((10,), chunks=5, dtype="f4")
    lo8, _ = x8.rechunk(10).expr.transfer_bytes()
    lo4, _ = x4.rechunk(10).expr.transfer_bytes()
    assert lo8 == 2 * lo4


def test_movement_models_agree_with_values(rng):
    # the cost model is advisory; pin that the plans it describes compute
    x = rng.standard_normal((20, 12))
    d = da.from_array(x, chunks=(5, 4))
    r = d.rechunk((8, 6))
    assert_eq(r, x)
    sh = da.from_array(x[:, 0].copy(), chunks=5).shuffle(
        [[3, 1], [0, 2], list(range(4, 20))], axis=0
    )
    assert_eq(sh, x[:, 0][[3, 1, 0, 2] + list(range(4, 20))])
