"""Binary-op chunk unification battery.

Ports the CASES of the reference's ``tests/test_binary_op_chunks.py``
(26 tests): alignment matrices, the cost-aware auto policy's
inflation/healing/ratio-boundary behaviors, limit handling, and the
roll/realign interactions.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu import config
from dask_array_tpu._chunks import PerformanceWarning, unify_blockdims
from dask_array_tpu._test_utils import assert_eq


@pytest.fixture
def rng():
    return np.random.default_rng(59)


# -- alignment matrix ----------------------------------------------------------


def test_aligned_1d(rng):
    x = rng.standard_normal((24,))
    a = da.from_array(x, chunks=6)
    b = da.from_array(x, chunks=6)
    out = a + b
    assert out.chunks == ((6,) * 4,)
    assert_eq(out, 2 * x)


def test_aligned_2d(rng):
    x = rng.standard_normal((12, 12))
    out = da.from_array(x, chunks=(4, 6)) * da.from_array(x, chunks=(4, 6))
    assert out.chunks == ((4, 4, 4), (6, 6))
    assert_eq(out, x * x)


def test_multiples_align(rng):
    x = rng.standard_normal((24,))
    out = da.from_array(x, chunks=6) + da.from_array(x, chunks=12)
    assert_eq(out, 2 * x)
    assert sum(out.chunks[0]) == 24


def test_misaligned_boundaries(rng):
    x = rng.standard_normal((10,))
    out = da.from_array(x, chunks=(3, 7)) + da.from_array(x, chunks=(6, 4))
    assert_eq(out, 2 * x)


def test_non_divisible(rng):
    x = rng.standard_normal((17,))
    out = da.from_array(x, chunks=5) - da.from_array(x, chunks=4)
    assert_eq(out, np.zeros(17))


def test_classic_uneven(rng):
    x = rng.standard_normal((100,))
    out = da.from_array(x, chunks=(30, 30, 30, 10)) + da.from_array(x, chunks=(25,) * 4)
    assert_eq(out, 2 * x)


def test_scalar_broadcast_no_unify(rng):
    x = rng.standard_normal((20,))
    d = da.from_array(x, chunks=(3, 7, 10))
    out = d + 5.0
    assert out.chunks == d.chunks  # scalar never reshapes the grid
    assert_eq(out, x + 5)


def test_mixed_ndim_broadcast(rng):
    x = rng.standard_normal((6, 8))
    v = rng.standard_normal((8,))
    out = da.from_array(x, chunks=(3, 4)) + da.from_array(v, chunks=2)
    assert_eq(out, x + v)


# -- auto policy cost model (unit level) ----------------------------------------


def test_light_coarse_operand_does_not_inflate():
    # the incident case: a tiny coarse vector must not pull a huge fine
    # operand up to its layout
    fine = (25,) * 40
    coarse = (1000,)
    out = unify_blockdims([(coarse, 1e6), (fine, 1e10)], policy="auto")
    assert out == fine


def test_light_fine_operand_follows_heavy_coarse():
    fine = (25,) * 40
    coarse = (250,) * 4
    out = unify_blockdims([(coarse, 1e10), (fine, 1e6)], policy="auto")
    assert out == coarse


def test_comparable_weights_keep_merging():
    out = unify_blockdims([((50, 50), 1e6), ((25,) * 4, 2e6)], policy="auto")
    assert out == (50, 50)  # moved (2e6) <= 4x backing (1e6)


def test_cost_ratio_boundary():
    from dask_array_tpu._chunks import _MERGE_COST_RATIO

    backing = 1e6
    at_limit = _MERGE_COST_RATIO * backing
    out = unify_blockdims([((50, 50), backing), ((25,) * 4, at_limit)], policy="auto")
    assert out == (50, 50)  # exactly at the ratio: still merge
    out2 = unify_blockdims([((50, 50), backing), ((25,) * 4, at_limit * 1.01)], policy="auto")
    assert out2 == (25,) * 4  # past the ratio: refine


def test_fragment_healing_merge():
    # a slivered layout heals toward the clean one when the clean side backs it
    sliver = (1, 49, 50)
    clean = (50, 50)
    out = unify_blockdims([(clean, 1e9), (sliver, 1e6)], policy="auto")
    assert out == clean


def test_coarse_policy_always_merges():
    out = unify_blockdims([((50, 50), 1.0), ((25,) * 4, 1e12)], policy="coarse")
    assert out == (50, 50)


def test_refine_policy_always_refines():
    out = unify_blockdims([((50, 50), 1e12), ((25,) * 4, 1.0)], policy="refine")
    assert out == (25,) * 4


def test_refines_instead_of_merging_past_limit():
    with pytest.warns(PerformanceWarning):
        out = unify_blockdims(
            [((100, 100), 8e8), ((50,) * 4, 1.0)],
            policy="auto",
            limit_bytes=100,
            row_bytes=10.0,
        )
    assert out == (50, 50, 50, 50)


def test_merges_under_limit():
    out = unify_blockdims(
        [((100, 100), 8e8), ((50,) * 4, 1.0)],
        policy="auto",
        limit_bytes=10_000,
        row_bytes=10.0,
    )
    assert out == (100, 100)


def test_single_chunk_layout_splits_free():
    # a single-chunk operand is never a layout CANDIDATE: it splits freely
    # toward whichever multi-chunk layout wins
    out = unify_blockdims([((100,), 8e12), ((50, 50), 1.0)], policy="auto")
    assert out == (50, 50)


def test_single_chunk_operand_still_defers():
    # a single-chunk operand is "coarse" but tiny: it must not inflate others
    out = unify_blockdims([((1000,), 1e3), ((100,) * 10, 1e10)], policy="auto")
    assert out == (100,) * 10


def test_shrinking_operand_does_not_trip():
    # equal layouts never count as movers
    out = unify_blockdims(
        [((50, 50), 1e9), ((50, 50), 1e9), ((25,) * 4, 1e6)], policy="auto"
    )
    assert out == (50, 50)


def test_nobody_backs_coarse_prefers_biggest():
    # intersection of boundaries is coarser than BOTH: nobody backs it;
    # the big operand's own layout wins when the mover is light
    out = unify_blockdims([((30, 70), 1e10), ((60, 40), 1e3)], policy="auto")
    assert out == (30, 70)


def test_nobody_backs_coarse_comparable_picks_healthiest():
    # comparable weights, no common coarsening: the healthiest candidate
    # grid wins (fewest chunks, largest min chunk)
    out = unify_blockdims([((30, 70), 1e9), ((60, 40), 1e9)], policy="auto")
    assert out == (60, 40)


def test_nobody_backs_coarse_heavy_movers_refine():
    # six comparable operands with distinct layouts: every candidate's
    # movers exceed ratio x backing -> union-of-boundaries refinement
    layouts = [((i, 100 - i), 1e9) for i in (11, 23, 37, 51, 63, 77)]
    out = unify_blockdims(layouts, policy="auto")
    assert out == (11, 12, 14, 14, 12, 14, 23)


def test_unknown_sizes_raise():
    with pytest.raises(ValueError, match="unknown"):
        unify_blockdims(
            [((float("nan"), float("nan")), 1.0), ((25, 25, 25, 25), 1.0)],
            policy="auto",
        )


def test_length_mismatch_raises():
    with pytest.raises(ValueError, match="align"):
        unify_blockdims([((50, 50), 1.0), ((30, 30), 1.0)], policy="auto")


# -- end-to-end policy behavior --------------------------------------------------


def test_roll_sliver_realigns_end_to_end(rng):
    # roll produces a slivered layout; the add must heal toward the source
    x = rng.standard_normal((120,))
    d = da.from_array(x, chunks=30)
    out = da.roll(d, 1) + d
    assert_eq(out, np.roll(x, 1) + x)
    # healed: no 1-element slivers survive in the output grid
    assert min(out.chunks[0]) > 1, out.chunks


def test_half_chunk_shift_end_to_end(rng):
    x = rng.standard_normal((120,))
    d = da.from_array(x, chunks=30)
    out = da.roll(d, 15) + d
    assert_eq(out, np.roll(x, 15) + x)


def test_cross_io_no_rechunk_inserted(rng):
    # both operands are IO leaves: alignment absorbs into a leaf read
    from dask_array_tpu._rechunk import Rechunk

    x = rng.standard_normal((60,))
    out = da.from_array(x, chunks=20) * da.from_array(x, chunks=15)
    lowered = out.expr.optimize(fuse=False)
    assert not any(isinstance(n, Rechunk) for n in lowered.walk()), lowered.tree_repr()
    assert_eq(out, x * x)


def test_where_three_operand_unify(rng):
    x = rng.standard_normal((30,))
    a = da.from_array(x, chunks=10)
    b = da.from_array(x * 2, chunks=15)
    c = da.from_array(x > 0, chunks=6)
    out = da.where(c, a, b)
    assert_eq(out, np.where(x > 0, x, x * 2))


# -- blockwise concatenate semantics (parity: dask blockwise docs) ---------------


def test_blockwise_concatenate_true_contracts(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))

    def inner(a, b):
        return np.tensordot(a, b, axes=((1,), (0,)))

    out = da.blockwise(
        inner, "ik", d, "ij", d.T, "jk", dtype="f8", concatenate=True
    )
    assert_eq(out, x @ x.T, rtol=1e-10)


def test_blockwise_concatenate_none_gives_lists(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    seen = []

    def inner(parts):
        # default concatenate=None: contracted dim arrives as a LIST
        assert isinstance(parts, list)
        seen.append(len(parts))
        return sum(np.sum(np.asarray(p), axis=1, keepdims=True) for p in parts)

    out = da.blockwise(inner, "i", d, "ij", dtype="f8")
    got = np.asarray(out.compute()).ravel()
    np.testing.assert_allclose(got, x.sum(axis=1))
    assert seen and all(n == 2 for n in seen)  # 2 column blocks per call


def test_blockwise_concatenate_false_doc_example(rng):
    # the dask docstring example: sum a contracted dim from a list
    def sequence_dot(x_blocks, y_blocks):
        result = 0
        for xb, yb in zip(x_blocks, y_blocks):
            result += np.asarray(xb).dot(np.asarray(yb))
        return result

    x = rng.standard_normal((8,))
    y = rng.standard_normal((8,))
    dx = da.from_array(x, chunks=4)
    dy = da.from_array(y, chunks=4)
    out = da.blockwise(sequence_dot, "", dx, "i", dy, "i", dtype="f8")
    np.testing.assert_allclose(float(out.compute()), x @ y)
