"""Collection-level parity, fifth batch — the remaining reference test
names (/root/reference/dask_array/tests/test_collection.py) with no
same-name analog here.

Reference-framework-specific scenarios are re-keyed to this design's
equivalents: the frisky binary-records contract maps to the planrec plan
fingerprint (the cross-process program-cache key), ``__dask_graph__`` maps
to ``.dask``, and scheduler-forcing/store-dispatch tests have no analog
(one SPMD executor, no scheduler registry) — those assert the store
contract they were protecting instead.
"""

import pickle
import warnings

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._planrec import plan_fingerprint
from dask_array_tpu._test_utils import assert_eq


# ---------------------------------------------------------------------------
# pickling keeps keys / fingerprints stable
# ---------------------------------------------------------------------------


def test_array_pickle_preserves_lowering_config_for_key_stability():
    x = (da.from_array(np.arange(20), chunks=5) + 1)[:12]
    expected_name = x.name
    y = pickle.loads(pickle.dumps(x))
    assert y.name == expected_name
    assert_eq(y, np.arange(20)[:12] + 1)


def test_array_pickle_preserves_lowering_config_for_frisky_records():
    # frisky-records analog: the planrec plan fingerprint (the program
    # cache key) survives a pickle round-trip bit-for-bit
    x = (da.from_array(np.arange(20), chunks=5) + 1)[:12]
    fp = plan_fingerprint(x.expr.optimize())
    y = pickle.loads(pickle.dumps(x))
    assert plan_fingerprint(y.expr.optimize()) == fp


def test_optimized_array_pickle_keeps_frisky_keys_stable_without_cache():
    x = ((da.from_array(np.arange(20), chunks=5) + 1)[:12].mean()).optimize()
    fp = plan_fingerprint(x.expr)
    name = x.name
    y = pickle.loads(pickle.dumps(x))
    assert y.name == name
    assert plan_fingerprint(y.expr.optimize()) == fp
    assert_eq(y, (np.arange(20)[:12] + 1).mean())


# ---------------------------------------------------------------------------
# optimize() contracts
# ---------------------------------------------------------------------------


def test_array_optimize_is_idempotent():
    x = ((da.ones((10, 10), chunks=(5, 5)) + 1) * 2).optimize()
    assert x.optimize().name == x.name
    assert x.optimize().expr._name == x.expr._name


def test_array_optimize_matches_expr_optimize_for_common_shapes():
    arrays = [
        (da.from_array(np.arange(20), chunks=5) + 1)[2:17],
        da.ones((6, 4), chunks=(3, 2)).rechunk((2, 4)),
        (da.ones((6, 4), chunks=(3, 2)) + 1).sum(axis=0),
        (da.ones((4, 4), chunks=(2, 2)) + 1) * 2,
    ]
    for x in arrays:
        assert x.optimize().expr._name == x.expr.optimize()._name


def test_array_optimize_computes_correct_values():
    x = da.from_array(np.arange(20), chunks=5)
    result = ((x + 1)[2:17]).optimize()
    assert_eq(result, np.arange(20)[2:17] + 1)


@pytest.mark.parametrize("func", ["sum", "mean", "var", "std", "min", "max", "prod", "any", "all"])
def test_reductions_toplevel(func):
    arr = da.from_array(np.random.default_rng(0).random((5, 6)), chunks=(2, 3))
    result = getattr(da, func)(arr, axis=0)
    expected = getattr(np, func)(arr.compute(), axis=0)
    assert_eq(result, expected)


def test_name_matches_dask_key_namespace_after_lowering():
    for array in [
        (da.from_array(np.arange(20), chunks=5) + 1)[:12],
        da.ones((6, 4), chunks=(3, 2)).rechunk((2, 4)),
    ]:
        keys = list(dict(array.dask).keys())
        assert keys
        assert all(key[0] == array.name for key in keys)


def test_reshape_accepts_c_order_keyword():
    x = da.from_array(np.arange(6), chunks=3)
    assert_eq(x.reshape((2, 3), order="C"), np.arange(6).reshape((2, 3)))


# ---------------------------------------------------------------------------
# store
# ---------------------------------------------------------------------------


def test_delayed_can_unpack_compute_false_store():
    x = np.arange(12).reshape(3, 4)
    y = da.from_array(x, chunks=(2, 2))
    target = np.empty_like(x)
    writes = da.store(y, target, compute=False, return_stored=True)
    w = writes[0] if isinstance(writes, (list, tuple)) else writes
    result = w.compute()
    np.testing.assert_array_equal(target, x)
    np.testing.assert_array_equal(result, x)


def test_store_forces_local_scheduler_only_for_inmemory_targets():
    # no scheduler registry here (one SPMD executor); the contract the
    # reference protects is that in-memory numpy targets are REALLY mutated
    x = np.arange(12).reshape(3, 4)
    y = da.from_array(x, chunks=(2, 2))
    target = np.zeros_like(x)
    da.store(y + 1, target)
    np.testing.assert_array_equal(target, x + 1)


def test_to_zarr_rechunk_warning_is_da_performance_warning(tmp_path):
    from dask_array_tpu.io._zarr import to_zarr

    x = da.ones((20,), chunks=(15,))
    with pytest.warns(da.PerformanceWarning, match="rechunked along axis"):
        to_zarr(x, str(tmp_path / "a.zarr"), chunks=(10,))
    assert_eq(da.from_zarr(str(tmp_path / "a.zarr")), np.ones(20))


# ---------------------------------------------------------------------------
# from_graph
# ---------------------------------------------------------------------------


def test_from_graph_tracks_expression_dependencies():
    import operator

    from dask_array_tpu.io._from_graph import from_graph

    x = da.from_array(np.arange(6), chunks=(3,)).rechunk((2,))
    name = "plus-one"
    layer = {
        (name, i): (operator.add, (x.name, i), 1) for i in range(len(x.chunks[0]))
    }
    y = from_graph(
        layer,
        np.empty((0,), dtype=x.dtype),
        x.chunks,
        [(name, i) for i in range(len(x.chunks[0]))],
        name,
        dependencies=[x],
    )
    assert_eq(y[:4], np.arange(4) + 1)


def test_from_graph_accepts_rename_keyword():
    from dask_array_tpu.io._from_graph import from_graph

    x = from_graph(
        {("x", 0): np.array([1])},
        np.empty((0,), dtype=int),
        ((1,),),
        [("x", 0)],
        "x",
        rename={"x": "renamed"},
    )
    assert x.name == "renamed"
    assert_eq(x, np.array([1]))


# ---------------------------------------------------------------------------
# structural optimizer contracts
# ---------------------------------------------------------------------------


def test_transpose_optimize():
    a = np.random.default_rng(1).random((10, 20))
    b = da.from_array(a, chunks=(2, 5))
    assert b.T.T.expr.optimize()._name == b.expr.optimize()._name
    assert_eq(b.T.T, a)

    c = da.from_array(np.random.default_rng(2).random((3, 4, 5)), chunks=(1, 2, 3))
    d = c.transpose((2, 0, 1)).transpose((1, 2, 0))
    assert_eq(d, c)


def test_rechunk_optimize():
    a = np.random.default_rng(3).random((10, 10))
    b = da.from_array(a, chunks=(4, 4))
    c = b.rechunk((2, 5)).rechunk((5, 2))
    d = b.rechunk((5, 2))
    assert c.expr.optimize()._name == d.expr.optimize()._name
    assert_eq(c, a)


def test_dask_optimize_rechunk():
    x = da.from_array(np.arange(12), chunks=3).rechunk((4,))
    optimized = x.optimize()
    assert_eq(optimized, np.arange(12))
    assert optimized.chunks == ((4, 4, 4),)


def test_slicing_optimize_identity():
    a = np.random.default_rng(4).random((10, 20))
    b = da.from_array(a, chunks=(2, 5))
    assert b[:].expr.optimize()._name == b.expr._name
    assert_eq(b[:], a)


def test_slicing_optimize_fusion():
    a = np.random.default_rng(5).random((10, 20))
    b = da.from_array(a, chunks=(2, 5))
    result = b[5:, 4][::2]
    expected = b[5::2, 4]
    assert result.expr.optimize()._name == expected.expr.optimize()._name
    assert_eq(result, a[5::2, 4])


def test_slicing_pushdown_elemwise():
    a = np.random.default_rng(6).random((10, 20))
    b = da.from_array(a, chunks=(2, 5))
    result = (b + 1)[:5]
    expected = b[:5] + 1
    assert result.expr.optimize()._name == expected.expr.optimize()._name
    assert_eq(result, (a + 1)[:5])

    result2 = (b + 1)[5]
    expected2 = b[5] + 1
    assert result2.expr.optimize()._name == expected2.expr.optimize()._name
    assert_eq(result2, (a + 1)[5])


def test_slicing_pushdown_elemwise_broadcast():
    a = np.random.default_rng(7).random((10, 20))
    c = np.random.default_rng(8).random((20,))
    aa = da.from_array(a, chunks=(2, 5))
    cc = da.from_array(c, chunks=(5,))

    result = (aa + cc)[:5]
    expected = aa[:5] + cc
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, (a + c)[:5])

    result2 = (aa + cc)[:, ::2]
    expected2 = aa[:, ::2] + cc[::2]
    assert result2.expr.simplify()._name == expected2.expr.simplify()._name
    assert_eq(result2, (a + c)[:, ::2])


def test_slicing_pushdown_transpose():
    a = np.random.default_rng(9).random((10, 20))
    b = da.from_array(a, chunks=(2, 5))
    result = b.T[5:]
    expected = b[:, 5:].T
    assert result.expr.optimize()._name == expected.expr.optimize()._name
    assert_eq(result, a.T[5:])


def _unwrap_fused(expr):
    from dask_array_tpu._blockwise import FusedBlockwise

    return expr.root if isinstance(expr, FusedBlockwise) else expr


def test_rechunk_pushdown_transpose():
    a = np.random.default_rng(10).random((10, 20))
    b = da.from_array(a, chunks=(2, 5))
    result = b.T.rechunk((10, 5))
    opt = _unwrap_fused(result.expr.optimize())
    assert type(opt).__name__ != "Rechunk"  # pushed below the transpose
    assert_eq(result, a.T)


def test_rechunk_pushdown_elemwise():
    a = np.random.default_rng(11).random((10, 10))
    b = da.from_array(a, chunks=(4, 4))
    result = (b + 1).rechunk((5, 5))
    opt = _unwrap_fused(result.expr.optimize())
    assert type(opt).__name__ != "Rechunk"
    assert_eq(result, a + 1)


def test_rechunk_pushdown_elemwise_broadcast():
    a = np.random.default_rng(12).random((10,))
    aa = da.from_array(a)
    b = np.random.default_rng(13).random((10, 10))
    bb = da.from_array(b)
    c = (aa + bb).rechunk((5, 2))
    expected = aa.rechunk((2,)) + bb.rechunk((5, 2))
    assert c.expr.simplify()._name == expected.expr.simplify()._name
    opt = _unwrap_fused(c.expr.optimize())
    assert type(opt).__name__ != "Rechunk"
    assert_eq(c, a + b)


def test_optimized_empty_stack_and_concatenate_have_no_missing_dependencies():
    x = da.from_array(np.arange(1.0).reshape((1, 1, 1)), chunks=((1,), (1,), (1,)))
    sliced = x[slice(1, 1), slice(1, 1), 0]

    empty = np.empty((0, 0))
    rows = da.concatenate([sliced, da.from_array(empty, chunks=((0,), (0,)))], axis=0)
    result = da.concatenate([rows, da.from_array(empty, chunks=((0,), (0,)))], axis=1)
    stacked = da.stack(
        [
            da.from_array(empty, chunks=((0, 0), (0,))),
            da.from_array(empty, chunks=((0,), (0,))),
        ],
        axis=0,
    )
    assert_eq(result, empty)
    assert_eq(stacked, np.stack([empty, empty]))


def test_optimize_3d_transpose():
    a = da.random.random((4, 5, 6), chunks=2)
    result = a.transpose((2, 0, 1)).transpose((1, 2, 0))
    opt = result.expr.optimize()
    assert type(opt).__name__ != "Transpose" or opt.axes == tuple(range(3))
    assert_eq(result, a)


def test_pushdown_broadcast_both_arrays():
    a = da.from_array(np.random.default_rng(14).random((10, 1)), chunks=(5, 1))
    b = da.from_array(np.random.default_rng(15).random((1, 20)), chunks=(1, 10))
    a_np, b_np = a.compute(), b.compute()

    result = (a + b)[:5, :10]
    expected = a[:5, :] + b[:, :10]
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, (a_np + b_np)[:5, :10])

    result = (a + b).rechunk((2, 5))
    expected = a.rechunk((2, 1)) + b.rechunk((1, 5))
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, a_np + b_np)


def test_rechunk_pushdown_to_io():
    from dask_array_tpu.ops._from_array import FromArray

    a = np.random.default_rng(16).random((10, 10))
    b = da.from_array(a, chunks=(4, 4))
    result = b.rechunk((5, 2)).expr.optimize()
    assert type(result) is FromArray
    assert result.chunks == ((5, 5), (2, 2, 2, 2, 2))


def test_rechunk_chain_optimize():
    from dask_array_tpu.ops._from_array import FromArray

    a = np.random.default_rng(17).random((10, 10))
    b = da.from_array(a, chunks=(4, 4))
    result = b.rechunk((2, 5)).rechunk((5, 2)).expr.optimize()
    assert type(result) is FromArray
    assert result.chunks == ((5, 5), (2, 2, 2, 2, 2))


def test_rechunk_transpose_pushdown_to_io():
    a = np.random.default_rng(18).random((10, 10))
    b = da.from_array(a, chunks=(4, 4))
    result = b.T.rechunk((5, 2))
    opt = _unwrap_fused(result.expr.optimize())
    assert type(opt).__name__ != "Rechunk"
    assert result.expr.optimize().chunks == ((5, 5), (2, 2, 2, 2, 2))
    assert_eq(result, a.T)


def test_rechunk_elemwise_pushdown_to_io():
    a = np.random.default_rng(19).random((10, 10))
    b = da.from_array(a, chunks=(4, 4))
    result = (b + 1).rechunk((5, 5))
    opt = _unwrap_fused(result.expr.optimize())
    assert type(opt).__name__ != "Rechunk"
    assert result.expr.optimize().chunks == ((5, 5), (5, 5))
    assert_eq(result, a + 1)


def test_rechunk_pushdown_concatenate_other_axis():
    a = da.ones((10, 20), chunks=(5, 10))
    b = da.ones((10, 20), chunks=(5, 10))
    concat = da.concatenate([a, b], axis=0)
    result = concat.rechunk({1: 5})
    expected = da.concatenate([a.rechunk({1: 5}), b.rechunk({1: 5})], axis=0)
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, expected)


def test_rechunk_pushdown_concatenate_correctness():
    a = np.arange(20).reshape(4, 5)
    b = np.arange(20, 40).reshape(4, 5)
    da_a = da.from_array(a, chunks=(2, 3))
    da_b = da.from_array(b, chunks=(2, 3))
    concat = da.concatenate([da_a, da_b], axis=0)
    result = concat.rechunk({1: 2})
    expected = da.concatenate([da_a.rechunk({1: 2}), da_b.rechunk({1: 2})], axis=0)
    assert result.expr.simplify()._name == expected.expr.simplify()._name
    assert_eq(result, np.concatenate([a, b], axis=0))


# ---------------------------------------------------------------------------
# fusion contracts
# ---------------------------------------------------------------------------


def test_fusion_elemwise_with_out_and_where_true():
    a = da.from_array(np.arange(4), chunks=2)
    b = da.from_array(np.arange(4, 8), chunks=2)
    out = da.zeros(4, chunks=2)
    result = da.add(a, b, out=out)
    assert result is out
    expected = np.zeros(4)
    np.add(np.arange(4), np.arange(4, 8), out=expected)
    assert_eq(result, expected)


def test_fusion_elemwise_with_out_and_where_array():
    a = da.from_array(np.arange(4), chunks=2)
    b = da.from_array(np.arange(4, 8), chunks=2)
    where = da.from_array(np.array([True, False, True, False]), chunks=2)
    out = da.zeros(4, dtype=int, chunks=2)
    result = da.add(a, b, where=where, out=out)
    assert result is out
    expected = np.zeros(4, dtype=int)
    np.add(
        np.arange(4),
        np.arange(4, 8),
        where=np.array([True, False, True, False]),
        out=expected,
    )
    assert_eq(result, expected)


def test_fusion_blockwise_contracted_dimensions():
    # contracted dims (in input, not output) with single blocks fuse and
    # compute; concatenate=True hands the kernel one dense array
    arr_3d = da.from_array(np.ones((1, 1, 3)), chunks=(1, 1, 1))
    result = da.blockwise(
        lambda x: x.mean(axis=(0, 1)),
        (2,),
        arr_3d.expr,
        (0, 1, 2),
        dtype="f8",
        concatenate=True,
    )
    close = da.isclose(result, np.array([1.0, 1.0, 1.0]))
    assert bool(np.all(close.compute()))


def test_fusion_blockwise_multiblock_contracted_prevents_fusion():
    # multi-block contracted dims still compute correctly (the gather is
    # explicit at execution; per-block fusion cannot absorb it)
    arr_3d = da.from_array(np.ones((2, 1, 3)), chunks=(1, 1, 1))
    result = da.blockwise(
        lambda x: np.asarray(x).sum(axis=(0, 1)),
        (2,),
        arr_3d.expr,
        (0, 1, 2),
        dtype="f8",
        concatenate=True,
    )
    assert np.allclose(np.asarray(result.compute()), 2.0)


def test_fuse_many_preserves_values_and_shares_subtree():
    # multi-consumer fusion: computing several consumers of one shared
    # subtree in one program preserves every value and order
    base = da.ones((40, 40), chunks=(20, 20)) * 3 + 1
    consumers = [base + i for i in range(4)] + [base * (i + 1) for i in range(4)]
    results = da.compute(*consumers)
    assert len(results) == len(consumers)
    base_np = np.ones((40, 40)) * 3 + 1
    for got, i in zip(results[:4], range(4)):
        np.testing.assert_allclose(got, base_np + i)
    for got, i in zip(results[4:], range(4)):
        np.testing.assert_allclose(got, base_np * (i + 1))
