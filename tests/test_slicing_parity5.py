"""Slicing parity, fifth batch — the remaining reference test names with no
same-name analog (/root/reference/dask_array/tests/test_slicing.py).

The reference's block-mapping internals (``_slice_1d`` task dicts, ``Task``/
``Alias`` graph entries) don't exist here; those scenarios are asserted
through this framework's equivalents: ``sliced_blockdim`` (block windows +
per-block slices), chunk profiles, plan-node counts via ``.dask``, and name
stability.  Adapted-by-design scenarios are noted inline.
"""

import itertools
import warnings

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._slicing import normalize_index, sliced_blockdim
from dask_array_tpu._test_utils import assert_eq


def test_slice_1d():
    # the reference's _slice_1d returns {block: slice} maps; sliced_blockdim
    # returns (out_blockdims, [(block, slice), ...]) — assert the same
    # block coverage and resulting chunk profile
    dims, picks = sliced_blockdim((25,) * 4, slice(10, 51, None))
    assert dims == (15, 25, 1)
    assert [b for b, _ in picks] == [0, 1, 2]

    # negative steps visit blocks in reverse
    dims, picks = sliced_blockdim((20,) * 5, slice(100, 12, -3))
    assert sum(dims) == len(range(100, 12, -3)[0:0] or range(99, 12, -3))
    assert [b for b, _ in picks] == [4, 3, 2, 1, 0]

    dims, picks = sliced_blockdim((20,) * 5, slice(None, None, -4))
    assert sum(dims) == 25
    assert [b for b, _ in picks] == [4, 3, 2, 1, 0]

    dims, picks = sliced_blockdim((23,) * 5, slice(None, None, -7))
    assert sum(dims) == len(range(114, -1, -7))


def test_slice_singleton_value_on_boundary():
    # an integer index on a block boundary touches exactly one block
    x = da.from_array(np.arange(15), chunks=5)
    y = x[10]
    g = dict(y.optimize().dask)
    assert len(g) == 1
    assert y.compute() == 10


def test_new_blockdim():
    dims, _ = sliced_blockdim((5, 5, 5, 5), slice(0, None, 2))
    assert list(dims) == [3, 2, 3, 2]


def test_slicing_and_unknown_chunks():
    a = da.ones((10, 5), chunks=5)
    ua = a[a[:, 0] > 0]  # unknown first dimension
    with pytest.raises(ValueError, match="unknown chunk sizes"):
        ua[[0, 5]]


def test_slicing_with_negative_step_flops_keys():
    # block order reverses; the reference asserts task keys, here the chunk
    # profile and values carry the contract
    x = da.from_array(np.arange(10), chunks=5)
    y = x[:1:-1]
    assert y.chunks == ((5, 3),)
    assert_eq(y, np.arange(10)[:1:-1])


def test_boolean_list_slicing():
    with pytest.raises(IndexError):
        da.asarray(range(2))[[True]]
    with pytest.raises(IndexError):
        da.asarray(range(2))[[False, False, False]]
    x = np.arange(5)
    ind = [True, False, False, False, True]
    assert_eq(da.asarray(x)[ind], x[ind])
    ind = [True]
    assert_eq(da.asarray([0])[ind], np.arange(1)[ind])


def test_boolean_numpy_array_slicing():
    with pytest.raises(IndexError):
        da.asarray(range(2))[np.array([True])]
    with pytest.raises(IndexError):
        da.asarray(range(2))[np.array([False, False, False])]
    x = np.arange(5)
    ind = np.array([True, False, False, False, True])
    assert_eq(da.asarray(x)[ind], x[ind])
    ind = np.array([True])
    assert_eq(da.asarray([0])[ind], np.arange(1)[ind])


def test_slicing_consistent_names_after_normalization():
    x = da.zeros(10, chunks=(5,))
    assert x[0:].name == x[:10].name
    assert x[0:].name == x[0:10].name
    assert x[0:].name == x[0:10:1].name
    assert x[:].name == x[0:10:1].name


def test_sanitize_index_element():
    x = da.from_array(np.arange(10), chunks=5)
    with pytest.raises((TypeError, IndexError)):
        x["Hello!"]


def test_sanitize_index():
    x = da.from_array(np.arange(10), chunks=5)
    # tuple-of-ints indexers behave like arrays
    assert_eq(x[(1, 2, 3),], np.arange(10)[[1, 2, 3]])
    with pytest.raises((TypeError, IndexError)):
        x[("Hello!",)]


@pytest.mark.parametrize(
    "slc, n_tasks",
    [
        (slice(0, 100), 10),
        (slice(0, 10), 1),
        (slice(500, 600), 10),
        (3, 1),
    ],
)
def test_cull(slc, n_tasks):
    x = da.ones(1000, chunks=(10,))
    y = x[slc]
    graph = dict(y.optimize().dask)
    assert len(graph) < len(dict(x.optimize().dask))
    assert len(graph) == n_tasks
    assert_eq(y, np.ones(1000)[slc])


@pytest.mark.parametrize("creation", ["ones", "zeros", "full"])
@pytest.mark.parametrize(
    "index",
    [
        (slice(3, 22), slice(10, 40, 2)),
        (5, slice(None)),
        (slice(None), 7),
        (slice(8, 9), slice(11, 12)),
    ],
)
def test_slice_into_creation_2d(creation, index):
    shape = (40, 50)
    if creation == "full":
        x = da.full(shape, 7.5, chunks=(10, 10))
        expected = np.full(shape, 7.5)[index]
    else:
        x = getattr(da, creation)(shape, chunks=(10, 10))
        expected = getattr(np, creation)(shape)[index]

    y = x[index]
    assert_eq(y, expected)
    graph = dict(y.optimize().dask)
    n_blocks = int(np.prod([len(c) for c in y.chunks])) if y.ndim else 1
    assert len(graph) == n_blocks


@pytest.mark.parametrize("shape", [(2,), (2, 3), (2, 3, 5)])
@pytest.mark.parametrize(
    "index",
    [(Ellipsis,), (None, Ellipsis), (Ellipsis, None), (None, Ellipsis, None)],
)
def test_slicing_with_Nones(shape, index):
    x = np.random.default_rng(0).random(shape)
    d = da.from_array(x, chunks=shape)
    assert_eq(x[index], d[index])


def test_slicing_integer_no_warnings():
    X = da.random.default_rng().random(size=(100, 2), chunks=(2, 2))
    idx = np.array([0, 0, 1, 1])
    with warnings.catch_warnings(record=True) as record:
        warnings.simplefilter("always")
        X[idx].compute()
    assert not record


def test_slicing_none_int_ellipes():
    # the reference's full 4096-combination grid is marked slow; a stratified
    # sample keeps the same coverage shape at test-suite cost
    indexers = [Ellipsis, slice(2), 0, 1, -2, -1, slice(-2, None), None]
    shape = (2, 3, 5, 7)
    x = np.arange(np.prod(shape)).reshape(shape)
    y = da.asarray(x)
    rng = np.random.default_rng(0)
    combos = list(itertools.product(indexers, indexers, indexers))
    rng.shuffle(combos)
    checked = 0
    for ind in combos:
        if ind.count(Ellipsis) > 1:
            continue
        assert_eq(x[ind], y[ind])
        checked += 1
        if checked >= 60:
            break
    assert checked == 60


def test_normalize_index():
    assert normalize_index((Ellipsis, None), (10,)) == (slice(None), None)
    assert normalize_index(5, (np.nan,)) == (5,)
    assert normalize_index(-5, (np.nan,)) == (-5,)
    (result,) = normalize_index([-5, -2, 1], (np.nan,))
    assert np.asarray(result).tolist() == [-5, -2, 1]
    assert normalize_index(slice(-5, -2), (np.nan,)) == (slice(-5, -2),)


def test_getitem_avoids_large_chunks():
    from dask_array_tpu import config

    with config.set({"array.chunk-size": "0.1Mb"}):
        a = np.arange(2 * 128 * 128, dtype="int64").reshape(2, 128, 128)
        indexer = [0] + [1] * 11
        arr = da.from_array(a, chunks=(1, 8, 8))
        assert_eq(arr[indexer], a[indexer])

        arr = da.from_array(a, chunks=(1, 128, 128))
        result = arr[indexer]
        assert_eq(result, a[indexer])
        # oversized gather groups split to per-index blocks
        assert result.chunks == ((1,) * 12, (128,), (128,))


def test_getitem_avoids_large_chunks_missing():
    # take along a KNOWN axis works even when other axes have unknown chunks
    a = np.arange(4 * 36 * 36).reshape(4, 36, 36)
    arr = da.from_array(a, chunks=(1, 36, 36))
    m = arr[0, :, 0] >= 0  # all-true mask -> unknown axis 1
    arr2 = arr[:, m, :]
    indexer = [0, 1] + [2] * 5 + [3]
    assert np.array_equal(arr2[indexer].compute(), a[indexer])


def test_make_blockwise_sorted_slice():
    # the reference pre-sorts indexers per block pair; here the equivalent
    # contract is that sorted and unsorted gathers agree with numpy
    x = da.from_array(np.arange(8) * 10, chunks=4)
    index = np.array([6, 0, 4, 2, 7, 1, 5, 3])
    assert_eq(x[index], (np.arange(8) * 10)[index])
    assert_eq(x[np.sort(index)], (np.arange(8) * 10)[np.sort(index)])


def test_unknown_chunks_length_one():
    a = np.arange(256, dtype=int)
    arr = da.from_array(a, chunks=(256,))
    result = np.flatnonzero(arr)
    assert_eq(result[[0, -1]], np.flatnonzero(a)[[0, -1]])
    result = da.flatnonzero(arr)
    assert_eq(result[[0, -1]], np.flatnonzero(a)[[0, -1]])

    # a SINGLE unknown-size block still gathers correctly (the reference's
    # length-one special case); multiple unknown blocks raise
    a2 = a.reshape(16, 16)
    arr2 = da.from_array(a2, chunks=(8, 16))
    m = arr2[0, :] >= 0
    u = arr2[:, m]  # unknown axis 1, one block
    assert np.array_equal(u[:, [0, -1]].compute(), a2[:, [0, -1]])

    arr3 = da.from_array(a2, chunks=(8, 8))
    u3 = arr3[:, arr3[0, :] >= 0]  # unknown axis 1, two blocks
    with pytest.raises(ValueError, match="unknown chunk sizes"):
        u3[:, [0, -1]]


def test_take_sorted_indexer():
    # a full sorted indexer is the identity: it must never compile to a
    # gather — on a matching grid it vanishes, on a different grid it
    # becomes a relayout (here: absorbed into the leaf read)
    arr = da.from_array(
        np.arange(250 * 4.0).reshape(250, 4), chunks=((50, 100, 33, 67), 4)
    )
    result = arr[list(range(250)), :]
    assert_eq(result, np.arange(250 * 4.0).reshape(250, 4))
    opt = result.optimize()
    assert type(opt.expr).__name__ in ("FromArray", "Rechunk")

    even = da.from_array(np.arange(100.0), chunks=50)
    r = even[list(range(100))]
    assert r.optimize().name == even.optimize().name


def test_all_none_slices_just_mappings():
    # a block-aligned slice is pure block selection: the optimized plan is
    # a leaf read of exactly the selected blocks (the reference's Alias
    # layer), with no compute nodes
    arr = da.ones((10, 10), chunks=(1, 5))
    result = arr[slice(None, 6), slice(None)]
    g = dict(result.optimize().dask)
    assert len(g) == 12
    assert_eq(result, np.ones((6, 10)))


def test_slice_construction_does_not_lower(monkeypatch):
    """Slicing must not lower the input tree during construction, at any
    depth (the reference's O(depth^2) __getitem__ regression)."""
    from dask_array_tpu._expr import ArrayExpr

    calls = 0
    orig = ArrayExpr.lower_completely

    def counting(self):
        nonlocal calls
        calls += 1
        return orig(self)

    monkeypatch.setattr(ArrayExpr, "lower_completely", counting)

    def build(depth):
        x = da.from_array(np.zeros((1000, 8)), chunks=(250, 8))
        y = da.from_array(np.zeros((1000, 8)), chunks=(333, 8))
        deep = x
        for _ in range(depth):
            # a non-trivial slice on every layer exercises __getitem__
            deep = ((deep + y[: deep.shape[0], :]) * deep)[:-1, :]
        return deep

    calls = 0
    build(5)
    shallow = calls
    calls = 0
    build(20)
    deep = calls
    assert shallow == 0
    assert deep == 0
