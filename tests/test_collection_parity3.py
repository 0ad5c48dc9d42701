"""Round-3 collection parity battery, ported from the reference spine
(/root/reference/dask_array/tests/test_collection.py): exact from_array
names, store return_stored/load_stored contracts (incl. the icechunk
targets-not-values pattern), from_graph key/rename behaviors, lowering
work-sharing scaling, fusion conflict matrices (a+a.T, dot(x,x), broadcast
modulo, out=/where=), and field-access shapes."""

import operator

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.io._from_graph import from_graph


@pytest.fixture
def rng():
    return np.random.default_rng(19)


# ---------------------------------------------------------------------------
# from_array naming (reference test_from_array_name_is_exact / metadata reuse)
# ---------------------------------------------------------------------------


def test_from_array_name_is_exact():
    x = np.arange(6)
    d = da.from_array(x, chunks=3, name="custom-name")
    assert d.name == "custom-name"
    assert_eq(d, x)


def test_from_array_exact_name_does_not_reuse_metadata():
    a_data = np.arange(6).reshape(2, 3)
    b_data = np.arange(20).reshape(4, 5)
    a = da.from_array(a_data, chunks=(1, 3), name="same-name")
    b = da.from_array(b_data, chunks=(2, 5), name="same-name")
    assert a.name == "same-name"
    assert b.name == "same-name"
    assert a.shape == (2, 3)
    assert a.chunks == ((1, 1), (3,))
    assert b.shape == (4, 5)
    assert b.chunks == ((2, 2), (5,))
    assert_eq(a, a_data)
    assert_eq(b, b_data)
    assert_eq(a + 1, a_data + 1)
    assert_eq(b + 1, b_data + 1)


def test_from_map_name_is_exact():
    d = da.io.from_map(lambda i: np.full(3, i, dtype="f8"), [0, 1], chunks=((3, 3),), dtype="f8", name="loader")
    assert d.name == "loader"
    assert_eq(d, np.array([0.0] * 3 + [1.0] * 3))


# ---------------------------------------------------------------------------
# store contracts (reference compute=False / return_stored / load_stored)
# ---------------------------------------------------------------------------


class StoreTarget:
    """A zarr.Array-ish write target carrying per-target state."""

    def __init__(self, name, shape):
        self.name = name
        self.data = np.zeros(shape)

    def __setitem__(self, index, value):
        self.data[index] = value


def test_store_compute_false_return_stored_roundtrip():
    x = np.arange(12).reshape(3, 4)
    y = da.from_array(x, chunks=(2, 2))
    target = np.empty_like(x)
    writes = da.store(y, target, compute=False, return_stored=True)
    result = np.asarray(writes.compute())
    np.testing.assert_array_equal(target, x)
    np.testing.assert_array_equal(result, x)


def _unwrap(block):
    if isinstance(block, np.ndarray) and block.dtype == object and block.shape == ():
        return block.item()
    return block


def test_store_load_stored_false_returns_targets_not_values():
    """The icechunk contract (dask/dask#11465): each block of the returned
    array is the TARGET that was written, not the data that landed in it."""
    source = da.from_array(np.arange(8.0), chunks=4)
    target = StoreTarget("t", (8,))
    stored = da.store(source, target, compute=False, return_stored=True, load_stored=False, lock=False)
    blocks = [_unwrap(stored.blocks[i].compute()) for i in range(2)]
    assert all(block is target for block in blocks)
    np.testing.assert_array_equal(target.data, np.arange(8.0))


def test_store_load_stored_false_feeds_followup_reduction():
    def read_name(block, axis=None, keepdims=None, computing_meta=False):
        if computing_meta:
            return np.array([object()], dtype=object)
        return np.array([_unwrap(block).name], dtype=object)

    def collect(names, axis=None, keepdims=None, computing_meta=False):
        if computing_meta:
            return np.array([object()], dtype=object)
        return np.array(sorted(np.concatenate(names).tolist()), dtype=object)

    source = da.from_array(np.arange(12.0), chunks=4)
    target = StoreTarget("t", (12,))
    stored = da.store(source, target, compute=False, return_stored=True, load_stored=False, lock=False)
    reduced = da.reduction(
        stored,
        chunk=read_name,
        aggregate=collect,
        concatenate=False,
        keepdims=False,
        dtype=object,
        meta=np.array([object()], dtype=object),
    )
    assert reduced.compute().tolist() == ["t", "t", "t"]
    np.testing.assert_array_equal(target.data, np.arange(12.0))


def test_store_region_rechunked_exact_name_slice():
    x = np.ones(30)
    y = da.from_array(x, chunks=(10, 10, 10), name="x")[5:25].rechunk((10, 10))
    target = np.zeros(30)
    da.store(y, target, regions=(slice(5, 25),))
    expected = np.zeros(30)
    expected[5:25] = 1
    np.testing.assert_array_equal(target, expected)


# ---------------------------------------------------------------------------
# from_graph (reference same-prefix / dependencies / rename)
# ---------------------------------------------------------------------------


def test_from_graph_same_key_prefix_different_layers():
    a = from_graph({("x", 0): np.array([1])}, np.empty((0,), dtype=int), ((1,),), [("x", 0)], "a")
    b = from_graph({("x", 0): np.array([2])}, np.empty((0,), dtype=int), ((1,),), [("x", 0)], "b")
    assert a.expr is not b.expr
    assert_eq(a, np.array([1]))
    assert_eq(b, np.array([2]))


def test_from_graph_name_adopted_and_rename():
    x = from_graph({("x", 0): np.array([1])}, np.empty((0,), dtype=int), ((1,),), [("x", 0)], "x")
    assert x.name == "x"
    renamed = from_graph(
        {("x", 0): np.array([1])}, np.empty((0,), dtype=int), ((1,),), [("x", 0)], "x",
        rename={"x": "renamed"},
    )
    assert renamed.name == "renamed"
    assert_eq(renamed, np.array([1]))


def test_from_graph_task_tuples_with_dependency_collection():
    x = da.from_array(np.arange(6), chunks=(3,)).rechunk((2,))
    name = "plus-one"
    layer = {
        (name, i): (operator.add, (x.name, i), 1) for i in range(len(x.chunks[0]))
    }
    # keys reference the dependency collection's own (content-addressed) keys
    y = from_graph(
        layer,
        np.empty((0,), dtype=x.dtype),
        x.chunks,
        [(name, i) for i in range(len(x.chunks[0]))],
        name,
        dependencies=[x],
    )
    assert_eq(y[:4], np.arange(4) + 1)


# ---------------------------------------------------------------------------
# lowering work sharing (reference shares_work_across_collections tests)
# ---------------------------------------------------------------------------


def test_optimize_shares_work_across_collections_with_shared_ancestry():
    """Optimizing many collections that share deep ancestry must reuse
    cached rewrites so total tokenize work grows near-linearly with depth
    (quadratic is the unfixed-bug regime)."""
    import dask_array_tpu.utils._tokenize as tkz

    def build_chain(depth):
        a = da.ones((100, 100), chunks=(10, 10))
        cols = []
        for _ in range(depth):
            a = a + a.mean(axis=1, keepdims=True)
            cols.append(a)
        return cols

    def count_tokenize(cols):
        calls = [0]
        original = tkz.tokenize

        def counted(*args, **kwargs):
            calls[0] += 1
            return original(*args, **kwargs)

        tkz.tokenize = counted
        try:
            for c in cols:
                c.optimize()
        finally:
            tkz.tokenize = original
        return calls[0]

    n_d = count_tokenize(build_chain(8))
    n_2d = count_tokenize(build_chain(16))
    # linear growth is ~2x; quadratic is ~4x; 3x separates the regimes
    assert n_2d < 3 * max(n_d, 1)


# ---------------------------------------------------------------------------
# fusion conflict matrix (reference test_fusion_*)
# ---------------------------------------------------------------------------


def test_blockwise_scalar_arg(rng):
    x = da.from_array(rng.random((10, 10)), chunks=(5, 5))
    z = da.blockwise(operator.add, "ij", x, "ij", 100, None, dtype=x.dtype)
    assert_eq(z, np.asarray(x.compute()) + 100)


def test_fusion_broadcast_modulo():
    a = da.from_array(np.arange(6).reshape(2, 3), chunks=(1, 3))
    b = da.from_array(np.arange(3), chunks=3)
    result = a * b
    expected = np.arange(6).reshape(2, 3) * np.arange(3)
    assert_eq(result, expected)
    assert_eq(da.Array(result.expr.optimize()), expected)


def test_fusion_dot_same_array():
    x = da.from_array(np.arange(9).reshape(3, 3), chunks=(2, 2))
    x_np = np.asarray(x.compute())
    result = da.dot(x, x)
    assert_eq(result, np.dot(x_np, x_np))
    assert_eq(result.persist(), np.dot(x_np, x_np))


def test_fusion_transpose_conflict():
    a = da.from_array(np.arange(9).reshape(3, 3), chunks=(2, 2))
    a_np = np.asarray(a.compute())
    result = a + a.T
    expected = a_np + a_np.T
    assert_eq(result, expected)
    assert_eq(da.Array(result.expr.optimize()), expected)


def test_fusion_chained_transpose():
    a = da.from_array(np.arange(6).reshape(2, 3), chunks=(1, 2))
    b = da.from_array(np.arange(6, 12).reshape(2, 3), chunks=(1, 2))
    result = (a + b).T
    expected = (np.arange(6) + np.arange(6, 12)).reshape(2, 3).T
    assert_eq(result, expected)
    assert_eq(da.Array(result.expr.optimize()), expected)


def test_fusion_out_same_as_input():
    x = da.from_array(np.array([0.0, 0.5, 1.0, 1.5]), chunks=2)
    x_np = np.asarray(x.compute()).copy()
    result = np.sin(x, out=x)
    assert result is x
    expected = np.sin(x_np)
    assert_eq(result, expected)


def test_fusion_elemwise_out_where_true():
    a = da.from_array(np.arange(4), chunks=2)
    b = da.from_array(np.arange(4, 8), chunks=2)
    out = da.zeros(4, chunks=2)
    result = da.add(a, b, out=out)
    assert result is out
    assert_eq(result, np.arange(4) + np.arange(4, 8), check_dtype=False)


def test_fusion_elemwise_out_where_array():
    a = da.from_array(np.arange(4), chunks=2)
    b = da.from_array(np.arange(4, 8), chunks=2)
    where = da.from_array(np.array([True, False, True, False]), chunks=2)
    out = da.zeros(4, dtype=int, chunks=2)
    result = da.add(a, b, where=where, out=out)
    assert result is out
    expected = np.zeros(4, dtype=int)
    np.add(np.arange(4), np.arange(4, 8), where=np.array([True, False, True, False]), out=expected)
    assert_eq(result, expected)


# ---------------------------------------------------------------------------
# misc member contracts
# ---------------------------------------------------------------------------


def test_astype_random_int(rng):
    x = da.from_array(rng.integers(1, 100, (10, 10)), chunks=(5, 5))
    result = x.astype(np.float64)
    assert_eq(result, np.asarray(x.compute()).astype(np.float64))


def test_stack_promote_type():
    i = np.arange(10, dtype="i4")
    f = np.arange(10, dtype="f4")
    res = da.stack([da.from_array(i, chunks=5), da.from_array(f, chunks=5)])
    assert_eq(res, np.stack([i, f]))


def test_rechunk_auto_object_dtype_raises():
    data = np.array(["a", "bb", "ccc", "dddd"], dtype=object)
    x = da.from_array(data, chunks=(2,))
    with pytest.raises(NotImplementedError, match="object dtype"):
        x.rechunk("auto")


def test_field_access():
    x = np.array([(1, 1.0), (2, 2.0)], dtype=[("a", "i4"), ("b", "f4")])
    y = da.from_array(x, chunks=(1,))
    assert_eq(y["a"], x["a"])
    assert_eq(y[["b", "a"]], x[["b", "a"]])


def test_field_access_with_shape():
    dtype = [("col1", ("f4", (3, 2))), ("col2", ("f4", 3))]
    data = np.ones((10, 5), dtype=dtype)
    x = da.from_array(data, 2)
    assert_eq(x["col1"], data["col1"])
    assert_eq(x[["col1"]], data[["col1"]])
    assert_eq(x["col2"], data["col2"])
    assert_eq(x[["col1", "col2"]], data[["col1", "col2"]])


def test_reductions_methods_match_toplevel(rng):
    x = rng.random((10, 10))
    a = da.from_array(x, chunks=(5, 5))
    for name in ["sum", "mean", "std", "var", "min", "max", "prod", "any", "all"]:
        assert_eq(getattr(a, name)(), getattr(np, name)(x).astype(getattr(a, name)().dtype))
