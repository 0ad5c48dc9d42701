"""Collection/optimizer discipline battery.

Ported from ``/root/reference/dask_array/tests/test_collection.py``:
optimize idempotency, chain-correctness spine, empty-array optimization,
fusion structure around shared prefixes and repeated operands, elemwise
``out=``/``where=`` kwargs, dtype promotion and rechunk guards.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._blockwise import Elemwise, FusedBlockwise
from dask_array_tpu._test_utils import assert_eq


def test_optimize_is_idempotent():
    rng = np.random.default_rng(42)
    x = da.from_array(rng.random((15, 25)), chunks=(3, 7))
    y = da.from_array(np.ones((15, 25)), chunks=(3, 7))
    cases = [
        ((x + y)[2:8] * 3),
        (x.sum()),
        ((x * y).mean(axis=0)),
        (x.T + 1),
        (x.rechunk((5, 5)) + 1),
        (da.stack([x[:, 0], y[:, 1]], axis=0)),
    ]
    for c in cases:
        e1 = c.expr.optimize()
        e2 = e1.optimize()
        e3 = e2.optimize()
        assert e1._name == e2._name == e3._name, type(c.expr).__name__


def test_optimization_correctness_various_chains():
    rng = np.random.default_rng(42)
    a_np = rng.random((15, 25))
    a = da.from_array(a_np, chunks=(3, 7))

    assert_eq(a.T.T, a_np, check_chunks=False)
    assert_eq(a.T[5:].T, a_np[:, 5:], check_chunks=False)
    assert_eq((a + 1).rechunk((5, 5))[:10], (a_np + 1)[:10], check_chunks=False)
    assert_eq(a.rechunk((5, 5)).rechunk((3, 3)), a_np, check_chunks=False)
    assert_eq(a[::2, 1:][::2], a_np[::2, 1:][::2], check_chunks=False)
    assert_eq((a * 2)[:, 10:][5:], (a_np * 2)[:, 10:][5:], check_chunks=False)


def test_optimize_empty_array():
    a = da.zeros((0, 10), chunks=(1, 5))
    result = (a + 1)[:, :5]
    assert result.shape == (0, 5)
    assert_eq(result, np.zeros((0, 5)), check_chunks=False)


def test_optimized_empty_stack_and_concatenate():
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
    assert_eq(result, np.empty((0, 0)), check_chunks=False)
    assert_eq(stacked, np.stack([empty, empty], axis=0), check_chunks=False)


def test_optimize_scalar_in_elemwise():
    a_np = np.arange(20.0).reshape(4, 5)
    a = da.from_array(a_np, chunks=(2, 3))
    assert_eq((a + 7.5) * 2, (a_np + 7.5) * 2, check_chunks=False)
    assert_eq((2 ** a)[1:], (2 ** a_np)[1:], check_chunks=False)


def test_chunks_preserved_after_optimization():
    a = da.ones((12, 12), chunks=(4, 6))
    out = (a + 1) * 2
    assert out.expr.optimize().chunks == ((4, 4, 4), (6, 6))


def test_fusion_same_array_different_indices():
    # x + x.T: the same leaf enters the group twice under different indices
    a_np = np.arange(36.0).reshape(6, 6)
    x = da.from_array(a_np, chunks=(3, 3))
    out = x + x.T
    opt = out.expr.optimize()
    assert any(isinstance(e, FusedBlockwise) for e in opt.walk())
    assert_eq(out, a_np + a_np.T, check_chunks=False)


def test_fusion_chained_transpose():
    a_np = np.arange(24.0).reshape(4, 6)
    x = da.from_array(a_np, chunks=(2, 3))
    out = (x.T + 1).T * 2
    assert_eq(out, (a_np.T + 1).T * 2, check_chunks=False)


def test_fusion_shared_prefix_upstream_of_fused_branches():
    a = np.arange(12)
    x = da.from_array(a, chunks=4)
    prefix = ((x + 1) * 4) - 2
    left = ((prefix + 2) * 3) - 1
    right = ((prefix < 7) * 5) + 9

    result = da.stack([left, right], axis=0)
    prefix_expected = ((a + 1) * 4) - 2
    expected = np.stack(
        [((prefix_expected + 2) * 3) - 1, ((prefix_expected < 7) * 5) + 9], axis=0
    )

    optimized = result.expr.optimize(fuse=True)
    exprs = list(optimized.walk())
    # both branches fuse; the shared prefix subtree stays ONE DAG node
    # (absorbed into both groups — the executor's build memo and XLA CSE
    # evaluate it once, unlike the reference's task-graph 3-group split)
    groups = [e for e in exprs if isinstance(e, FusedBlockwise)]
    assert len(groups) == 2
    trees = [{n._name for n in g.walk()} - {g._name} for g in groups]
    assert trees[0] & trees[1]  # the prefix subtree is one shared DAG node
    assert_eq(da.Array(optimized), expected, check_chunks=False)


def test_fusion_many_branches_shared_prefix():
    a = np.arange(30.0)
    x = da.from_array(a, chunks=10)
    prefix = x * 2 + 1
    branches = [prefix + i for i in range(5)]
    result = da.stack(branches, axis=0)
    expected = np.stack([a * 2 + 1 + i for i in range(5)], axis=0)
    assert_eq(result, expected, check_chunks=False)


def test_elemwise_out_and_where():
    a_np = np.arange(12.0)
    x = da.from_array(a_np, chunks=4)
    y = da.ones(12, chunks=4)
    o = da.zeros(12, chunks=4)
    r = da.add(x, y, where=x > 5, out=o)
    expected = np.add(a_np, np.ones(12), where=a_np > 5, out=np.zeros(12))
    assert_eq(r, expected, check_chunks=False)


def test_elemwise_where_array():
    a_np = np.arange(12.0)
    mask = (np.arange(12) % 3) == 0
    x = da.from_array(a_np, chunks=4)
    m = da.from_array(mask, chunks=4)
    o = da.full(12, -1.0, chunks=4)
    r = da.multiply(x, 2, where=m, out=o)
    expected = np.multiply(a_np, 2, where=mask, out=np.full(12, -1.0))
    assert_eq(r, expected, check_chunks=False)


def test_stack_promote_type():
    s = da.stack(
        [da.from_array(np.arange(3, dtype="i4")), da.from_array(np.arange(3, dtype="f8"))]
    )
    assert s.dtype == np.dtype("f8")
    assert_eq(s, np.stack([np.arange(3, dtype="i4"), np.arange(3, dtype="f8")]), check_chunks=False)


def test_rechunk_auto_object_dtype_raises():
    obj = da.from_array(np.array([1, "a", None], dtype=object), chunks=1)
    with pytest.raises((NotImplementedError, ValueError)):
        obj.rechunk("auto")


def test_astype_chain():
    a_np = np.arange(10, dtype="i8")
    x = da.from_array(a_np, chunks=4)
    y = x.astype("f4").astype("f8") + 0.5
    assert y.dtype == np.dtype("f8")
    assert_eq(y, a_np.astype("f4").astype("f8") + 0.5, check_chunks=False)


def test_reduction_scalar_aggregate_meta():
    x = da.ones((6, 6), chunks=3)
    s = x.sum()
    assert s.shape == ()
    assert float(s.compute()) == 36.0


def test_array_member_surface():
    # reference Array members: simplify/partitions/A/transfer_bytes/to_svg/
    # to_backend/dask export (reference _collection.py:184-1199)
    x = da.from_array(np.arange(24.0).reshape(4, 6), chunks=(2, 3))
    assert type(x.simplify()) is type(x)
    assert x.partitions[0, 1].shape == (2, 3)
    assert x.A is x
    assert x.transfer_bytes() == (0, 0)
    assert "<svg" in x.to_svg()
    assert x.to_backend() is x and x.to_backend("jax") is x
    with pytest.raises(ValueError):
        x.to_backend("cupy")
    with pytest.raises(ImportError):
        x.to_dask_dataframe()
    g = x.dask
    assert len(g) == 4
    key = next(k for k in g if k[1:] == (0, 0))
    np.testing.assert_array_equal(
        np.asarray(g[key].compute()), np.arange(24.0).reshape(4, 6)[:2, :3]
    )


def test_reshape_order_keyword():
    x = da.from_array(np.arange(24.0).reshape(4, 6), chunks=(2, 3))
    assert x.reshape(24, order="C").shape == (24,)
    with pytest.raises(NotImplementedError):
        x.reshape(24, order="F")
