"""Routines corners, third tranche (reference ``tests/test_routines.py``).

Includes the cases where this framework is deliberately MORE permissive
than the reference: its per-block algorithms must raise on layouts they
cannot expand (histogramdd chunk-compatibility errors, searchsorted
``sorter=``), while the dense-trace executor here handles them — pinned
with value tests against numpy rather than with raises.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_derived_docstrings():
    # numpy-parity functions inherit numpy's documentation + provenance note
    assert "numpy.argwhere" in da.argwhere.__doc__
    assert "non-zero" in da.argwhere.__doc__
    assert "numpy.linalg.cholesky" in da.cholesky.__doc__
    assert "numpy.fft.fftshift" in da.fft.fftshift.__doc__
    # hand-written docstrings are never overwritten by the deriver
    assert "ghost cells" in da.map_overlap.__doc__
    # every public callable is documented
    import inspect

    undocumented = [
        n
        for n in da.__all__
        if callable(getattr(da, n))
        and not inspect.isclass(getattr(da, n))
        and not inspect.getdoc(getattr(da, n))
    ]
    assert undocumented == [], undocumented


def test_searchsorted_sorter_computes(rng):
    # the reference raises NotImplementedError for sorter=
    # (tests/test_routines.py:741); the dense trace supports it directly
    a = np.array([3, 1, 2, 5, 4])
    sorter = np.argsort(a)
    v = np.array([2, 3, 4, 0, 6])
    got = da.searchsorted(
        da.from_array(a, chunks=2),
        da.from_array(v, chunks=3),
        sorter=da.from_array(sorter, chunks=2),
    )
    assert_eq(got, np.searchsorted(a, v, sorter=sorter))


def test_histogramdd_any_sample_chunking_computes(rng):
    # reference: "Input array can only be chunked along the 0th axis"
    # (tests/test_routines.py:1092); here any chunking computes correctly
    s = rng.random((10, 3))
    h, edges = da.histogramdd(da.from_array(s, chunks=(5, 1)), bins=10, range=((0, 1),) * 3)
    h_np, edges_np = np.histogramdd(s, bins=10, range=((0, 1),) * 3)
    assert_eq(h, h_np)
    for e, en in zip(edges, edges_np):
        assert_eq(e, en)


def test_histogramdd_mismatched_coord_chunks_compute(rng):
    # reference: "All coordinate arrays must be chunked identically."
    x = da.from_array(rng.random(10), chunks=2)
    y = da.from_array(rng.random(10), chunks=2)
    z = da.from_array(rng.random(10), chunks=5)
    h, edges = da.histogramdd((x, y, z), bins=(3,) * 3, range=((0, 1),) * 3)
    sample = np.stack([np.asarray(c.compute()) for c in (x, y, z)], axis=-1)
    h_np, _ = np.histogramdd(sample, bins=(3,) * 3, range=((0, 1),) * 3)
    assert_eq(h, h_np)


def test_histogramdd_scalar_bins_without_range_lazy_edges(rng):
    # reference raises "requires either specifying..." — here the edges
    # derive lazily from the data min/max (same contract as histogram)
    s = rng.random((10, 3))
    h, edges = da.histogramdd(da.from_array(s, chunks=(5, 3)), bins=4)
    h_np, edges_np = np.histogramdd(s, bins=4)
    assert_eq(h, h_np)
    for e, en in zip(edges, edges_np):
        assert_eq(e, en)


def test_histogramdd_scalar_bins_with_range(rng):
    s = rng.random((10, 3))
    ranges = ((0, 1),) * 3
    h, edges = da.histogramdd(da.from_array(s, chunks=(5, 3)), bins=4, range=ranges)
    h_np, edges_np = np.histogramdd(s, bins=4, range=ranges)
    assert h.shape == (4, 4, 4)
    assert_eq(h, h_np)
    for e, en in zip(edges, edges_np):
        assert_eq(e, en)


def test_isnull_zero_dim_returns_scalar():
    # compute() of 0-d results is a numpy scalar here (uniform framework
    # convention; the reference returns a 0-d ndarray for this case)
    arr = da.from_array(np.arange(3, dtype=np.int64), chunks=-1)
    result = da.isnull(arr[0]).compute()
    assert result == np.False_
    assert np.ndim(result) == 0


def test_argwhere_obj(rng):
    x = rng.integers(10, size=(15, 16)).astype(object)
    d = da.from_array(x, chunks=(4, 5))
    assert_eq(da.argwhere(d), np.argwhere(x))


def test_argwhere_str():
    x = np.array(list("Hello world"))
    d = da.from_array(x, chunks=(4,))
    assert_eq(da.argwhere(d), np.argwhere(x))


def test_einsum_output_chunksizes():
    # contraction keeps the operand chunk grids on the surviving axes
    x = da.ones((6, 4), chunks=2)
    y = da.ones((4, 5), chunks=2)
    out = da.einsum("ij,jk->ik", x, y)
    assert out.chunks == ((2, 2, 2), (2, 2, 1))
    assert_eq(out, np.full((6, 5), 4.0))


def test_isclose_equal_nan():
    x = np.array([0, np.nan, 1, 1.5])
    y = np.array([1e-9, np.nan, 1, 2])
    a = da.from_array(x, chunks=2)
    b = da.from_array(y, chunks=2)
    assert_eq(da.isclose(a, b, equal_nan=True), np.isclose(x, y, equal_nan=True))


def test_allclose_equal_nan():
    x = np.array([0, np.nan, 1, 1.5])
    y = np.array([1e-9, np.nan, 1, 2])
    a = da.from_array(x, chunks=2)
    b = da.from_array(y, chunks=2)
    assert bool(da.allclose(a, b, equal_nan=True).compute()) == bool(
        np.allclose(x, y, equal_nan=True)
    )
