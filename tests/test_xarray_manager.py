"""xarray ChunkManagerEntrypoint: the manager EXECUTES (VERDICT item 7).

xarray is not installable in this image, so these tests drive the manager
class through the exact method surface xarray's
``namedarray.parallelcompat`` invokes (chunk -> from_array/normalize_chunks,
compute, rechunk, apply_gufunc for ``apply_ufunc(dask="parallelized")``,
reduction/scan for aggregations, store for to_zarr) — the call patterns of
the reference's ``tests/test_xarray.py``.  When real xarray IS present,
``register()`` plugs the same class in; without it, register() raises a
clean ImportError (also pinned here).
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._collection import Array
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu._xarray import make_manager_class


@pytest.fixture
def rng():
    return np.random.default_rng(31)


@pytest.fixture
def manager():
    return make_manager_class()()


def test_manager_constructible_without_xarray(manager):
    assert manager.array_cls is Array
    assert manager.available


def test_is_chunked_array(manager, rng):
    x = rng.standard_normal((4, 4))
    assert not manager.is_chunked_array(x)
    assert manager.is_chunked_array(da.from_array(x, chunks=2))


def test_chunk_sequence(manager, rng):
    """ds.chunk(...) path: normalize_chunks then from_array."""
    x = rng.standard_normal((12, 8))
    norm = manager.normalize_chunks((4, "auto"), shape=x.shape, dtype=x.dtype)
    assert norm[0] == (4, 4, 4)
    d = manager.from_array(x, norm)
    assert manager.is_chunked_array(d)
    assert manager.chunks(d) == norm
    assert_eq(d, x)


def test_rechunk_and_compute(manager, rng):
    x = rng.standard_normal((8, 8))
    d = manager.from_array(x, ((4, 4), (8,)))
    r = manager.rechunk(d, ((8,), (4, 4)))
    assert manager.chunks(r) == ((8,), (4, 4))
    (out,) = manager.compute(r + 1)
    np.testing.assert_allclose(out, x + 1)
    # mixed chunked/non-chunked compute, like xarray's Dataset.compute
    a, b = manager.compute(r, np.float64(3.0))
    np.testing.assert_allclose(a, x)
    assert b == 3.0


def test_persist(manager, rng):
    x = rng.standard_normal((6,))
    d = manager.from_array(x, ((3, 3),))
    (p,) = manager.persist(d * 2)
    assert manager.is_chunked_array(p)
    assert_eq(p, x * 2)


def test_apply_gufunc_parallelized(manager, rng):
    """xr.apply_ufunc(..., dask='parallelized') lowers to apply_gufunc."""
    x = rng.standard_normal((6, 10))
    d = manager.from_array(x, ((3, 3), (10,)))
    out = manager.apply_gufunc(
        lambda a: np.mean(a, axis=-1), "(i)->()", d, output_dtypes=["f8"]
    )
    assert_eq(out, x.mean(axis=-1))


def test_reduction_protocol(manager, rng):
    """xarray aggregations route chunk/combine/aggregate callables here."""
    x = rng.standard_normal((8, 6))
    d = manager.from_array(x, ((4, 4), (6,)))
    out = manager.reduction(
        d, np.sum, combine_func=np.sum, aggregate_func=np.sum,
        axis=(0,), dtype="f8", keepdims=False,
    )
    assert_eq(out, x.sum(axis=0))


def test_scan_protocol(manager, rng):
    """xarray's cumulatives (cumsum/cumprod/ffill) route through scan."""
    x = rng.standard_normal((4, 12))
    d = manager.from_array(x, ((4,), (4, 4, 4)))
    out = manager.scan(np.cumsum, np.add, 0, d, axis=1, dtype="f8")
    assert_eq(out, np.cumsum(x, axis=1))

    def cummax_f(b, axis=None):
        return np.maximum.accumulate(b, axis=axis)

    out2 = manager.scan(cummax_f, np.maximum, -np.inf, d, axis=1)
    assert_eq(out2, np.maximum.accumulate(x, axis=1))


def test_map_blocks_and_blockwise(manager, rng):
    x = rng.standard_normal((6, 6))
    d = manager.from_array(x, ((3, 3), (6,)))
    m = manager.map_blocks(lambda b: b * 2, d, dtype="f8")
    assert_eq(m, x * 2)
    bw = manager.blockwise(lambda a, b: a + b, "ij", d, "ij", d, "ij", dtype="f8")
    assert_eq(bw, x * 2)


def test_unify_chunks(manager, rng):
    x = rng.standard_normal((8, 8))
    a = manager.from_array(x, ((4, 4), (8,)))
    b = manager.from_array(x, ((2,) * 4, (8,)))
    _, (ua, ub) = manager.unify_chunks(a, "ij", b, "ij")
    assert ua.chunks == ub.chunks
    assert_eq(ua + ub, 2 * x)


def test_store_to_zarr(manager, rng, tmp_path):
    """Dataset.to_zarr drives manager.store into zarr array targets."""
    from dask_array_tpu.io._zarr_lite import open_array

    x = rng.standard_normal((8, 4))
    d = manager.from_array(x, ((4, 4), (4,)))
    z = open_array(str(tmp_path / "x.zarr"), mode="w", shape=(8, 4), dtype="f8", chunks=(4, 4))
    manager.store([d], [z])
    np.testing.assert_allclose(z[0:8, 0:4], x)


def test_rolling_mean_pipeline(manager, rng):
    """ds.rolling(...).mean(): sliding_window_view + mean over the window
    dim — the duck-array path xarray takes over chunked arrays."""
    x = rng.standard_normal((5, 40))
    d = manager.from_array(x, ((5,), (10,) * 4))
    w = da.sliding_window_view(d, 7, axis=1)
    out = w.mean(axis=-1)
    expected = np.lib.stride_tricks.sliding_window_view(x, 7, axis=1).mean(axis=-1)
    assert_eq(out, expected)


def test_groupby_like_pipeline(manager, rng):
    """groupby-bins style: boolean select + reduce per group."""
    x = rng.standard_normal((100,))
    labels = rng.integers(0, 3, size=100)
    d = manager.from_array(x, ((25,) * 4,))
    means = []
    for g in range(3):
        mask = manager.from_array(labels == g, ((25,) * 4,))
        means.append(float(d[mask].mean().compute()))
    expected = [x[labels == g].mean() for g in range(3)]
    np.testing.assert_allclose(means, expected)


def test_register_requires_real_xarray():
    try:
        import xarray  # noqa: F401

        pytest.skip("real xarray installed; registration covered elsewhere")
    except ImportError:
        pass
    import dask_array_tpu.xarray as dx

    with pytest.raises(ImportError, match="xarray"):
        dx.register()
