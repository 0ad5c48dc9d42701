"""Slicing spine, second batch: behavior scenarios from the reference
``tests/test_slicing.py`` without a counterpart — pathological unsorted
indexers, setitem with mismatched mask chunks, vindex axis-fronting and dask
indexers, boolean setitem over unknown-shape leaves, negative-step block
flopping, creation absorption of every index kind, and unknown-shape
``from_delayed`` leaves (resolved at materialization).

Divergences (stronger, noted inline): vindex on multi-chunk/reshaped inputs
computes here (the reference raises IndexError for layouts its blockwise
vindex cannot address).
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu.io._from_map import delayed, from_delayed


def test_pathological_unsorted_slicing():
    x = da.ones(100, chunks=10)
    index = np.arange(100).reshape(10, 10).ravel(order="F")
    np.testing.assert_array_equal(np.asarray(x[index].compute()), np.ones(100)[index])


@pytest.mark.parametrize("params", [(2, 2, 1), (5, 3, 2)])
def test_setitem_with_different_chunks_preserves_shape(params):
    array_size, chunk_size1, chunk_size2 = params
    x = da.zeros(array_size, chunks=chunk_size1)
    mask = da.zeros(array_size, chunks=chunk_size2).astype(bool)
    x[mask] = 1
    result = np.asarray(x.compute())
    assert x.shape == result.shape
    np.testing.assert_array_equal(result, np.zeros(array_size))


@pytest.mark.parametrize(
    "indexer", [np.array([1, 3]), np.array([[1, 3], [0, 2]]), np.array([[[1], [2]]])]
)
def test_vindex_single_indexed_axis_moves_vectorized_dimensions_to_front(indexer):
    arr = np.arange(12).reshape(3, 4)
    darr = da.from_array(arr, chunks=(2, 2))
    expected = np.moveaxis(
        np.take(arr, indexer, axis=1),
        tuple(range(1, 1 + indexer.ndim)),
        tuple(range(indexer.ndim)),
    )
    np.testing.assert_array_equal(np.asarray(darr.vindex[:, indexer].compute()), expected)


def test_vindex_single_indexed_axis_zero_keeps_slices_last():
    arr = np.arange(12).reshape(3, 4)
    darr = da.from_array(arr, chunks=(2, 2))
    indexer = np.array([[1, 2], [0, 1]])
    np.testing.assert_array_equal(
        np.asarray(darr.vindex[indexer, :].compute()), arr[indexer, :]
    )


def test_vindex_with_dask_array():
    arr = np.array([0.2, 0.4, 0.6])
    darr = da.from_array(arr, chunks=-1)
    indexer = np.random.default_rng(0).integers(0, 3, 8).reshape(4, 2)
    dindexer = da.from_array(indexer, chunks=(2, 2))
    np.testing.assert_allclose(np.asarray(darr.vindex[dindexer].compute()), arr[indexer])
    # DIVERGENCE (stronger): multi-chunk and reshaped layouts compute here
    np.testing.assert_allclose(
        np.asarray(darr.rechunk((1,)).vindex[dindexer].compute()), arr[indexer]
    )
    with pytest.raises(IndexError):
        darr.vindex[(dindexer, None)]


@pytest.mark.parametrize(
    "shapes", [(10, 10), (float("nan"), float("nan")), (10, float("nan"))]
)
def test_boolean_mask_setitem_with_unknown_shape(shapes):
    x_shape, mask_shape = shapes
    x = da.concatenate(
        [from_delayed(delayed(np.ones)(10), shape=(x_shape,), dtype=float) for _ in range(2)]
    )
    mask = da.concatenate(
        [
            from_delayed(delayed(lambda: np.ones(10, dtype=bool))(), shape=(mask_shape,), dtype=bool)
            for _ in range(2)
        ]
    )
    x[mask] = 2
    np.testing.assert_array_equal(np.asarray(x.compute()), np.full(20, 2.0))


def test_from_delayed_unknown_shape_resolves_at_compute():
    y = from_delayed(delayed(np.arange)(7), shape=(float("nan"),), dtype="int64")
    assert np.isnan(y.shape[0])
    np.testing.assert_array_equal(np.asarray(y.compute()), np.arange(7))
    assert float((y + 1).sum().compute()) == 28.0


def test_from_delayed_unknown_shape_ndim_contract():
    bad = from_delayed(delayed(np.arange)(6), shape=(float("nan"), float("nan")), dtype="int64")
    with pytest.raises(ValueError, match="ndim"):
        bad.compute()


def test_slicing_with_negative_step_flops_blocks():
    x = da.from_array(np.arange(10), chunks=5)
    y = x[:1:-1]
    assert y.chunks == ((5, 3),)
    np.testing.assert_array_equal(np.asarray(y.compute()), np.arange(10)[:1:-1])


@pytest.mark.parametrize("creation", ["ones", "zeros", "full"])
@pytest.mark.parametrize(
    "index",
    [
        (3,),
        (slice(0, 20), slice(None, None, 3)),
        (slice(None, None, -1), slice(None, None, -2)),
        (2, 3),
    ],
)
def test_slice_into_creation_absorbs_and_matches_numpy(creation, index):
    if creation == "full":
        x = da.full((100, 40), 7.5, chunks=(10, 10))
        expected = np.full((100, 40), 7.5)[index]
    else:
        x = getattr(da, creation)((100, 40), chunks=(10, 10))
        expected = getattr(np, creation)((100, 40))[index]
    y = x[index]
    np.testing.assert_array_equal(np.asarray(y.compute()), expected)
    # fully absorbed: the optimized plan is the creation leaf itself
    opt = y.expr.simplify()
    assert len(list(opt.walk())) == 1, type(opt).__name__


def test_slice_construction_does_not_materialize():
    # building deep sliced stacks must not lower/execute anything per layer
    import dask_array_tpu._materialize as mat

    calls = 0
    orig = mat.optimize_expr

    def counting(*a, **k):
        nonlocal calls
        calls += 1
        return orig(*a, **k)

    mat.optimize_expr = counting
    try:
        x = da.from_array(np.zeros((1000, 8)), chunks=(250, 8))
        y = da.from_array(np.zeros((1000, 8)), chunks=(333, 8))
        deep = x
        for _ in range(40):
            deep = ((deep + y) * deep.mean(axis=1, keepdims=True))[0:1000]
        assert calls == 0
    finally:
        mat.optimize_expr = orig
