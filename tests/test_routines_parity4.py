"""Routines parity, fourth batch: scenarios ported from the reference spine
``/root/reference/dask_array/tests/test_routines.py`` that had no counterpart
here (atleast_nd grids, transpose/moveaxis corners, tensordot double
contractions, bincount weights, histogram/histogramdd argument validation and
delayed bins/range, cov aweights/fweights, where bool optimization, select/
piecewise corners, ravel array-likes, stack with unknown chunks, take on huge
axes, coarsen/aligned chunks, einsum broadcasting contractions, average
validation, tril/triu shapes and indices, push along axes).

Deliberate divergences from the reference (each noted inline):
- searchsorted(sorter=) WORKS here (reference raises NotImplementedError).
- histogram/histogramdd with a scalar bin count and no range take the data
  min/max lazily (the reference refuses; numpy computes it eagerly).
- histogramdd accepts any coordinate chunking (one dense XLA program; the
  reference requires identical 0-axis chunking).
"""

import itertools
import time
import warnings

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


rng = np.random.default_rng(42)


# ---------------------------------------------------------------------------
# array / atleast_nd / transpose family
# ---------------------------------------------------------------------------


def test_array_return_type():
    x = [0, 1, 2, 3]
    dx = da.array(x)
    assert isinstance(dx, da.Array)
    assert_eq(dx, np.array(x))


@pytest.mark.parametrize("funcname", ["atleast_1d", "atleast_2d", "atleast_3d"])
def test_atleast_nd_no_args(funcname):
    assert getattr(da, funcname)() == getattr(np, funcname)()


@pytest.mark.parametrize("funcname", ["atleast_1d", "atleast_2d", "atleast_3d"])
@pytest.mark.parametrize(
    "shape, chunks",
    [(tuple(), tuple()), ((4,), (2,)), ((4, 6), (2, 3)), ((4, 6, 8), (2, 3, 4)),
     ((4, 6, 8, 10), (2, 3, 4, 5))],
)
def test_atleast_nd_one_arg(funcname, shape, chunks):
    np_a = rng.random(shape)
    da_a = da.from_array(np_a, chunks=chunks)
    assert_eq(getattr(np, funcname)(np_a), getattr(da, funcname)(da_a))


@pytest.mark.parametrize("funcname", ["atleast_1d", "atleast_2d", "atleast_3d"])
@pytest.mark.parametrize(
    "shape1, shape2",
    list(itertools.combinations_with_replacement(
        [tuple(), (4,), (4, 6), (4, 6, 8)], 2)),
)
def test_atleast_nd_two_args(funcname, shape1, shape2):
    np_a_1, np_a_2 = rng.random(shape1), rng.random(shape2)
    da_a_1 = da.from_array(np_a_1, chunks=tuple(c // 2 for c in shape1))
    da_a_2 = da.from_array(np_a_2, chunks=tuple(c // 2 for c in shape2))
    np_r_n = getattr(np, funcname)(np_a_1, np_a_2)
    da_r_n = getattr(da, funcname)(da_a_1, da_a_2)
    assert type(np_r_n) is type(da_r_n)
    assert len(np_r_n) == len(da_r_n)
    for np_r, da_r in zip(np_r_n, da_r_n):
        assert_eq(np_r, da_r)


def test_transpose_negative_axes():
    x = np.ones((2, 3, 4, 5))
    y = da.ones((2, 3, 4, 5), chunks=3)
    assert_eq(x.transpose([-1, -2, 0, 1]), y.transpose([-1, -2, 0, 1]))


def test_transpose_skip_when_possible():
    x = da.ones((2, 3, 4), chunks=3)
    assert x.transpose((0, 1, 2)) is x
    assert x.transpose((-3, -2, -1)) is x


def test_moveaxis_rollaxis_keyword():
    x = rng.random((10, 12, 7))
    d = da.from_array(x, chunks=(4, 5, 2))
    assert_eq(np.moveaxis(x, destination=1, source=0),
              da.moveaxis(d, destination=1, source=0))
    assert_eq(np.rollaxis(x, 2), da.rollaxis(d, 2))
    assert isinstance(da.rollaxis(d, 1), da.Array)
    assert_eq(np.rollaxis(x, start=1, axis=2), da.rollaxis(d, start=1, axis=2))


def test_moveaxis_rollaxis_numpy_api():
    x = rng.random((4, 4, 4))
    a = da.from_array(x, chunks=2)
    result = np.moveaxis(a, 2, 0)
    assert isinstance(result, da.Array)
    assert_eq(result, np.moveaxis(x, 2, 0))
    result = np.rollaxis(a, 2, 0)
    assert isinstance(result, da.Array)
    assert_eq(result, np.rollaxis(x, 2, 0))


# ---------------------------------------------------------------------------
# tensordot / dot
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("axes", [0, 1, (0, 1), (1, 0), ((1, 2), (2, 0)), ((1, 2), (2, 1))])
def test_tensordot_2(axes):
    x = np.arange(4 * 4 * 4).reshape((4, 4, 4))
    y = da.from_array(x, chunks=2)
    assert_eq(da.tensordot(y, y, axes=axes), np.tensordot(x, x, axes=axes))


@pytest.mark.parametrize("chunks", ["auto", (4, 6), (2, 3), (4, 3), (2, 6)])
def test_tensordot_double_contraction_neq2(chunks):
    x = np.arange(24).reshape(4, 6)
    y = da.from_array(x, chunks=chunks)
    assert_eq(da.tensordot(y, y, axes=2), np.tensordot(x, x, axes=2))


def test_tensordot_double_contraction_ngt2():
    x = np.arange(60.0).reshape(3, 4, 5)
    y = np.arange(60.0).reshape(4, 5, 3)
    assert_eq(da.tensordot(da.from_array(x), da.from_array(y), axes=2),
              np.tensordot(x, y, axes=2))
    assert_eq(da.tensordot(da.from_array(x, chunks=3), da.from_array(y), axes=2),
              np.tensordot(x, y, axes=2))


def test_dot_method():
    x = np.arange(400).reshape((20, 20))
    a = da.from_array(x, chunks=(5, 5))
    y = np.arange(200).reshape((20, 10))
    b = da.from_array(y, chunks=(5, 5))
    assert_eq(a.dot(b), x.dot(y))


def test_dot_persist_equivalence():
    x = da.from_array(rng.random((4, 4)), chunks=(2, 2))
    x[x < 0.65] = 0
    y = x.persist()
    z = np.asarray(x.compute())
    rr = np.dot(z, z)
    assert np.allclose(rr, np.asarray(da.dot(x, x).compute()))
    assert np.allclose(rr, np.asarray(da.dot(y, y).compute()))


# ---------------------------------------------------------------------------
# bincount / searchsorted
# ---------------------------------------------------------------------------


def test_bincount_with_weights():
    x = np.array([2, 1, 5, 2, 1])
    d = da.from_array(x, chunks=2)
    weights = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    dweights = da.from_array(weights, chunks=2)
    e = da.bincount(d, weights=dweights, minlength=6)
    assert_eq(e, np.bincount(x, weights=weights, minlength=6))
    assert (da.bincount(d, weights=dweights, minlength=6).expr._name == e.expr._name)


def test_bincount_unspecified_minlength():
    x = np.array([1, 1, 3, 7, 0])
    d = da.from_array(x, chunks=2)
    e = da.bincount(d)
    np.testing.assert_array_equal(np.asarray(e.compute()), np.bincount(x))
    assert len(np.asarray(e.compute())) == 8


def test_searchsorted_sorter_works():
    # DIVERGENCE (stronger): the reference raises NotImplementedError for
    # sorter=; here it is supported with numpy semantics
    a = np.array([3, 1, 2])
    v = np.array([2, 3])
    sorter = np.argsort(a)
    got = da.searchsorted(da.asarray(a), da.asarray(v), sorter=da.asarray(sorter))
    np.testing.assert_array_equal(np.asarray(got.compute()),
                                  np.searchsorted(a, v, sorter=sorter))


# ---------------------------------------------------------------------------
# histogram: alternative bins/range, validation, delayed bins/range
# ---------------------------------------------------------------------------


def test_histogram_alternative_bins_range():
    v = da.from_array(rng.random(100), chunks=10)
    a1, b1 = da.histogram(v, bins=10, range=(0, 1))
    a2, b2 = np.histogram(np.asarray(v.compute()), bins=10, range=(0, 1))
    assert_eq(a1, a2)
    assert_eq(b1, b2)


def test_histogram_bins_range_with_nan_array():
    v = da.from_array(np.array([-2, np.nan, 2]), chunks=1)
    a1, b1 = da.histogram(v, bins=10, range=(-3, 3))
    a2, b2 = np.histogram(np.array([-2, np.nan, 2]), bins=10, range=(-3, 3))
    assert_eq(a1, a2)
    assert_eq(b1, b2)


def test_histogram_return_type():
    vn = rng.random(100)
    v = da.from_array(vn, chunks=10)
    bins = np.arange(0, 11, 1, dtype="i4")
    assert_eq(da.histogram(v * 10, bins=bins)[0], np.histogram(vn * 10, bins=bins)[0])


def test_histogram_extra_args_and_shapes():
    bins = np.arange(0, 1.01, 0.01)
    v1 = rng.random(100)
    v2 = rng.random((50, 50))
    data = [
        (da.from_array(v1, chunks=10), v1, bins, da.ones(100, chunks=10) * 5),
        (da.from_array(v2, chunks=10), v2, bins, da.ones((50, 50), chunks=10) * 5),
    ]
    for v, vn, bins, w in data:
        assert_eq(da.histogram(v, bins=bins, density=True)[0],
                  np.histogram(vn, bins=bins, density=True)[0])
        assert_eq(da.histogram(v, bins=bins, weights=w)[0],
                  np.histogram(vn, bins=bins, weights=np.asarray(w.compute()))[0])
        assert_eq(da.histogram(v, bins=bins, weights=w, density=True)[0],
                  np.histogram(vn, bins=bins, weights=np.asarray(w.compute()), density=True)[0])


def test_histogram_normed_deprecation():
    x = da.arange(10)
    with pytest.raises(ValueError) as info:
        da.histogram(x, bins=[1, 2, 3], normed=True)
    assert "density" in str(info.value)
    assert "deprecated" in str(info.value).lower()


@pytest.mark.parametrize(
    "bins, hist_range",
    [
        (None, None),
        (None, (1, 10)),
        (10, 1),
        (10, [0, 1, 2]),
        (10, [0]),
        (10, np.array([[0, 1]])),
        ("da", "da2d"),  # placeholder resolved in the body
        ([[0, 1, 2]], None),
        (np.array([[0, 1, 2]]), None),
        ("da2dbins", None),
    ],
)
def test_histogram_bin_range_raises(bins, hist_range):
    if isinstance(bins, str) and bins == "da":
        bins, hist_range = 10, da.array(np.array([[0, 1]]))
    elif isinstance(bins, str) and bins == "da2dbins":
        bins = da.array(np.array([[0, 1, 2]]))
    data = da.from_array(rng.random(10), chunks=2)
    with pytest.raises((ValueError, TypeError)) as info:
        da.histogram(data, bins=bins, range=hist_range)
    err_msg = str(info.value)
    assert "bins" in err_msg or "range" in err_msg


@pytest.mark.parametrize("density", [True, False])
@pytest.mark.parametrize("weighted", [True, False])
@pytest.mark.parametrize("non_delayed_i", [None, 0])
@pytest.mark.parametrize("delay_n_bins", [False, True])
def test_histogram_delayed_range(density, weighted, non_delayed_i, delay_n_bins):
    n = 23
    v = rng.random(n)
    vd = da.from_array(v, chunks=4)
    weights = rng.random(n)
    weights_d = da.from_array(weights, chunks=4)
    d_range = [vd.min(), vd.max()]
    if non_delayed_i is not None:
        d_range[non_delayed_i] = float(d_range[non_delayed_i].compute())
    hist_d, bins_d = da.histogram(
        vd,
        bins=da.array(n) if delay_n_bins and not density else n,
        range=d_range,
        density=density,
        weights=weights_d if weighted else None,
    )
    hist, bins = np.histogram(
        v, bins=n, range=[v.min(), v.max()], density=density,
        weights=weights if weighted else None,
    )
    np.testing.assert_allclose(np.asarray(hist_d.compute()), hist, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(bins_d.compute()), bins, rtol=1e-12)


@pytest.mark.parametrize("density", [True, False])
@pytest.mark.parametrize("weighted", [True, False])
def test_histogram_delayed_bins(density, weighted):
    n = 50
    v = rng.random(n)
    bins = np.array([0, 0.2, 0.5, 0.8, 1])
    vd = da.from_array(v, chunks=10)
    bins_d = da.from_array(bins, chunks=2)
    weights = rng.random(n)
    weights_d = da.from_array(weights, chunks=vd.chunks)
    hist_d, bins_d2 = da.histogram(
        vd, bins=bins_d, range=[bins_d[0], bins_d[-1]], density=density,
        weights=weights_d if weighted else None,
    )
    hist, _ = np.histogram(
        v, bins=bins, range=[bins[0], bins[-1]], density=density,
        weights=weights if weighted else None,
    )
    np.testing.assert_allclose(np.asarray(hist_d.compute()), hist, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(bins_d2.compute()), bins, rtol=1e-12)


def test_histogram_delayed_n_bins_raises_with_density():
    data = da.from_array(rng.random(10), chunks=2)
    with pytest.raises(NotImplementedError, match="`bins` cannot be a scalar Dask object"):
        da.histogram(data, bins=da.array(10), range=[0, 1], density=True)


# ---------------------------------------------------------------------------
# histogramdd
# ---------------------------------------------------------------------------


def test_histogramdd_alternative_bins_range():
    n1, n2 = 60, 3
    xn = rng.uniform(0, 1, size=(n1, n2))
    x = da.from_array(xn, chunks=(20, 3))
    bins = (3, 5, 4)
    ranges = ((0, 1),) * len(bins)
    a1, b1 = da.histogramdd(x, bins=bins, range=ranges)
    a2, b2 = np.histogramdd(xn, bins=bins, range=ranges)
    assert_eq(a1, a2)
    a1, _ = da.histogramdd(x, bins=4, range=ranges)
    a2, _ = np.histogramdd(xn, bins=4, range=ranges)
    assert_eq(a1, a2)
    assert float(a1.sum().compute()) == n1


def test_histogramdd_density():
    n1, n2 = 80, 3
    xn = rng.uniform(0, 1, size=(n1, n2))
    x = da.from_array(xn, chunks=(20, 3))
    bins = [[0, 0.5, 1], [0, 0.25, 0.85, 1], [0, 0.5, 0.8, 1]]
    a1, b1 = da.histogramdd(x, bins=bins, density=True)
    a2, b2 = np.histogramdd(xn, bins=bins, density=True)
    a3, b3 = da.histogramdd(x, bins=bins, normed=True)
    assert_eq(a1, a2)
    assert_eq(a1, a3)


def test_histogramdd_any_chunking_works():
    # DIVERGENCE (stronger): the reference requires 0-axis-only chunking and
    # identical coordinate chunking; here any chunking computes correctly
    # (the whole histogram is one dense XLA program)
    xn = rng.random((10, 3))
    x = da.from_array(xn, chunks=(5, 1))
    a1, _ = da.histogramdd(x, bins=4, range=((0, 1),) * 3)
    a2, _ = np.histogramdd(xn, bins=4, range=((0, 1),) * 3)
    assert_eq(a1, a2)

    cn = [rng.random(10) for _ in range(3)]
    coords = [da.from_array(c, chunks=ch) for c, ch in zip(cn, (2, 2, 5))]
    a1, _ = da.histogramdd(tuple(coords), bins=(3,) * 3, range=((0, 1),) * 3)
    a2, _ = np.histogramdd(np.stack(cn, axis=-1), bins=(3,) * 3, range=((0, 1),) * 3)
    assert_eq(a1, a2)

    w = da.from_array(rng.random(10), chunks=5)
    a1, _ = da.histogramdd(tuple(coords[:2]), bins=(3,) * 2, range=((0, 1),) * 2, weights=w)
    a2, _ = np.histogramdd(np.stack(cn[:2], axis=-1), bins=(3,) * 2,
                           range=((0, 1),) * 2, weights=np.asarray(w.compute()))
    assert_eq(a1, a2)


def test_histogramdd_raises_incompat_bins_or_range():
    data = da.from_array(rng.random((10, 4)), chunks=(5, 4))
    with pytest.raises(ValueError, match="The dimension of bins must be equal to the dimension of the sample"):
        da.histogramdd(data, bins=(2, 3, 4), range=((0, 1),) * 4)
    with pytest.raises(ValueError, match="range argument requires one entry, a min max pair, per dimension"):
        da.histogramdd(data, bins=(2, 3, 4, 5), range=((0, 1),) * 3)
    with pytest.raises(ValueError, match="range argument should be a sequence of pairs"):
        da.histogramdd(data, bins=(2, 3, 4, 5), range=((0, 1), (0, 1, 2), 3, 5))


def test_histogramdd_raise_normed_and_density():
    data = da.from_array(rng.random((10, 3)), chunks=(5, 3))
    with pytest.raises(TypeError, match="Cannot specify both 'normed' and 'density'"):
        da.histogramdd(data, bins=(4, 5, 6), range=((0, 1),) * 3, normed=True, density=True)


def test_histogramdd_raise_incompat_shape():
    with pytest.raises(ValueError, match="Single array input to histogramdd should be columnar"):
        da.histogramdd(da.from_array(rng.random(10), chunks=2), bins=4, range=((-3, 3),))
    with pytest.raises(ValueError, match="Single array input to histogramdd should be columnar"):
        da.histogramdd(da.from_array(rng.random((4, 4, 4)), chunks=2), bins=4, range=((-3, 3),))


@pytest.mark.parametrize("bins", [4, (4, 5, 6), [4, 5, 6]])
def test_histogramdd_scalar_bins_without_range_matches_numpy(bins):
    # DIVERGENCE (stronger): the reference raises without a range; here the
    # data min/max is taken lazily, matching numpy's eager behavior
    xn = rng.random((10, 3))
    x = da.from_array(xn, chunks=(5, 3))
    a1, edges1 = da.histogramdd(x, bins=bins)
    a2, edges2 = np.histogramdd(xn, bins=bins)
    assert_eq(a1, a2)
    for e1, e2 in zip(edges1, edges2):
        np.testing.assert_allclose(np.asarray(e1.compute()), e2, rtol=1e-12)


def test_histogramdd_scalar_bins_with_range_works():
    xn = rng.random((10, 3))
    x = da.from_array(xn, chunks=(5, 3))
    a1, edges1 = da.histogramdd(x, bins=4, range=((0, 1),) * 3)
    a2, edges2 = np.histogramdd(xn, bins=4, range=((0, 1),) * 3)
    assert_eq(a1, a2)
    assert a1.shape == (4, 4, 4)
    for e1, e2 in zip(edges1, edges2):
        np.testing.assert_allclose(np.asarray(e1.compute()), e2, rtol=1e-12)


def test_histogramdd_edges():
    xn = rng.random((10, 3))
    x = da.from_array(xn, chunks=(5, 3))
    edges = [np.array([0.1, 0.3, 0.8, 1.0]), np.array([0.2, 0.3, 0.8, 0.9]),
             np.array([0.1, 0.5, 0.7])]
    a1, b1 = da.histogramdd(x, bins=edges)
    a2, b2 = np.histogramdd(xn, bins=edges)
    assert_eq(a1, a2)
    for ib1, ib2 in zip(b1, b2):
        np.testing.assert_allclose(np.asarray(ib1.compute()), ib2)


# ---------------------------------------------------------------------------
# cov with aweights / fweights
# ---------------------------------------------------------------------------


def test_cov_aweights():
    x1n = np.array([[0, 2], [1, 1], [2, 0]]).T
    x1 = da.from_array(x1n)
    res1 = np.array([[1.0, -1.0], [-1.0, 1.0]])
    unit_aweights = np.ones(3, dtype=np.float64)
    assert np.allclose(np.asarray(da.cov(x1, aweights=unit_aweights).compute()), res1)
    aweights = np.array([0.5, 2.0, 0.5])
    weighted = np.asarray(da.cov(x1, aweights=da.from_array(aweights)).compute())
    assert np.allclose(weighted, np.cov(x1n, aweights=aweights))
    assert not np.allclose(weighted, np.asarray(da.cov(x1).compute()))
    assert np.allclose(
        np.asarray(da.cov(x1, aweights=da.from_array(np.ones(3))).compute()),
        np.asarray(da.cov(x1).compute()),
    )
    with pytest.raises(RuntimeError):
        da.cov(x1, aweights=da.ones((2, 3), dtype=np.float64))
    with pytest.raises(RuntimeError):
        da.cov(x1, aweights=da.ones(2, dtype=np.float64))


def test_cov_fweights_aweights_combined():
    x1n = np.array([[0, 2], [1, 1], [2, 0]]).T
    x1 = da.from_array(x1n)
    fweights = np.array([1, 2, 1])
    aweights = np.array([0.5, 1.0, 2.0])
    result = np.asarray(da.cov(x1, fweights=da.from_array(fweights),
                               aweights=da.from_array(aweights)).compute())
    assert result.shape == (2, 2)
    assert np.allclose(result, np.cov(x1n, fweights=fweights, aweights=aweights))
    assert not np.allclose(result, np.asarray(da.cov(x1, fweights=da.from_array(fweights)).compute()))
    assert not np.allclose(result, np.asarray(da.cov(x1, aweights=da.from_array(aweights)).compute()))


# ---------------------------------------------------------------------------
# roll / shape / ravel / squeeze
# ---------------------------------------------------------------------------


def test_roll_always_results_in_a_new_array():
    x = da.arange(2, 3)
    assert da.roll(x, 1) is not x


def test_roll_works_even_if_shape_is_0():
    assert_eq(np.roll(np.zeros(0), 0), da.roll(da.zeros(0), 0))


@pytest.mark.parametrize("shape", [(10,), (5, 10), (5, 10, 10)])
def test_shape_and_ndim(shape):
    x = da.ones(shape)
    assert np.shape(x) == shape
    assert np.ndim(x) == len(shape)


def test_ravel_1d_no_op():
    x = rng.integers(10, size=100)
    dx = da.from_array(x, chunks=10)
    assert_eq(dx.ravel(), x.ravel())
    assert_eq(dx[dx > 2].ravel(), x[x > 2].ravel())


def test_ravel_with_array_like():
    assert_eq(np.ravel(0), da.ravel(0))
    assert isinstance(da.ravel(0), da.Array)
    assert_eq(np.ravel([0, 0]), da.ravel([0, 0]))
    assert isinstance(da.ravel([0, 0]), da.Array)
    assert_eq(np.ravel((0, 0)), da.ravel((0, 0)))
    assert_eq(np.ravel([(0,), (0,)]), da.ravel([(0,), (0,)]))


def test_squeeze_1d_array():
    for shape in [(1,), (5,)]:
        a = np.full(shape=shape, fill_value=2)
        d = da.from_array(a, chunks=1)
        d_s = da.squeeze(d)
        assert isinstance(d_s, da.Array)
        assert_eq(d_s, np.squeeze(a))


# ---------------------------------------------------------------------------
# v/h/dstack with unknown chunk sizes
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "np_func, dsk_func, nan_chunk",
    [(np.hstack, da.hstack, 0), (np.dstack, da.dstack, 0), (np.vstack, da.vstack, 2)],
)
def test_stack_unknown_chunk_sizes(np_func, dsk_func, nan_chunk):
    shape = (20, 20, 20)
    x = da.ones(shape, chunks=10)
    y = np.ones(shape)
    mask = da.ones(20, chunks=10) > 0.5
    x_base = x[mask]
    if nan_chunk == 2:
        x = x_base.transpose(1, 0, 2)
        y = y.transpose(1, 0, 2)
    else:
        x = x_base
    with pytest.raises(ValueError):
        dsk_func((x, x))
    np_stacked = np_func((y, y))
    dsk_stacked = dsk_func((x, x), allow_unknown_chunksizes=True)
    np.testing.assert_array_equal(np.asarray(dsk_stacked.compute()), np_stacked)


# ---------------------------------------------------------------------------
# take on huge axes: construction must stay O(index length)
# ---------------------------------------------------------------------------


def test_take_large():
    a = da.arange(1_000_000_000_000, chunks=200_000_000, dtype="int64")
    x = np.arange(20, dtype="int64")
    np.testing.assert_array_equal(np.asarray(da.take(a, x, axis=0).compute()), x)
    x = np.arange(50, 300, dtype="int64")
    np.testing.assert_array_equal(np.asarray(da.take(a, x, axis=0).compute()), x)


def test_take_construction_cheap_on_huge_axis():
    a = da.arange(1_000_000_000_000, chunks=200_000_000, dtype="int64")
    idx = np.arange(20, dtype="int64")
    start = time.perf_counter()
    result = da.take(a, idx, axis=0)
    elapsed = time.perf_counter() - start
    assert result.shape == (20,)
    assert elapsed < 5.0, f"take construction took {elapsed:.1f}s (was O(axis length))"


def test_take_construction_cheap_on_single_huge_chunk():
    a = da.arange(1_000_000_000_000, chunks=1_000_000_000_000, dtype="int64")
    start = time.perf_counter()
    result = da.take(a, np.arange(20, dtype="int64"), axis=0)
    elapsed = time.perf_counter() - start
    assert result.shape == (20,)
    assert result.chunks == ((20,),)
    assert elapsed < 5.0


# ---------------------------------------------------------------------------
# isnull / piecewise / select / where / nonzero
# ---------------------------------------------------------------------------


def test_isnull():
    x = np.array([1, np.nan])
    a = da.from_array(x, chunks=2)
    assert_eq(da.isnull(a), np.isnan(x))
    assert_eq(da.notnull(a), ~np.isnan(x))


def test_isnull_result_is_numpy():
    # the reference pins np.ndarray; our 0-d compute convention returns the
    # numpy array-scalar (still numpy, never another library's object)
    arr = da.from_array(np.arange(3, dtype=np.int64), chunks=-1)
    result = da.isnull(arr[0]).compute()
    assert type(result).__module__ == "numpy"


def test_piecewise_otherwise():
    x = np.random.default_rng(1337).integers(10, size=(15, 16))
    d = da.from_array(x, chunks=(4, 5))
    funcs = [lambda e, v, k: e + 1, lambda e, v, k: v * e, lambda e, v, k: 0]
    assert_eq(
        np.piecewise(x, [x > 5, x <= 2], funcs, 1, k=2),
        da.piecewise(d, [d > 5, d <= 2], funcs, 1, k=2),
    )


def test_select_multidimension():
    x = rng.random((40, 20, 2))
    y = da.from_array(x, chunks=(20, 20, 1))
    res_x = np.select([x < 0, x > 2, x > 0.5], [x, x * 2, x * 3], default=1)
    res_y = da.select([y < 0, y > 2, y > 0.5], [y, y * 2, y * 3], default=1)
    assert isinstance(res_y, da.Array)
    assert_eq(res_y, res_x)


def test_select_return_dtype():
    d = np.array([1, 2, 3, np.nan, 5, 7])
    m = np.isnan(d)
    d_d = da.from_array(d)
    d_m = da.isnan(d_d)
    got = np.asarray(da.select([d_m], [d_d]).compute())
    want = np.select([m], [d])
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(got, want)


def test_where_scalar_dtype():
    x = np.int32(3)
    y1 = np.array([4, 5, 6], dtype=np.int16)
    c1 = np.array([1, 0, 1])
    y2 = da.from_array(y1, chunks=2)
    c2 = da.from_array(c1, chunks=2)
    assert_eq(np.where(c1, x, y1), da.where(c2, x, y2))
    assert_eq(np.where(True, x, y1), da.where(True, x, y1))


def test_where_bool_optimization():
    x = rng.integers(10, size=(15, 16))
    d = da.from_array(x, chunks=(4, 5))
    y = rng.integers(10, size=(15, 16))
    e = da.from_array(y, chunks=(4, 5))
    for c in [True, False, np.True_, np.False_, 1, 0]:
        w1 = da.where(c, d, e)
        assert_eq(w1, np.where(c, x, y))
        assert w1 is (d if c else e)


def test_where_nonzero():
    for shape, chunks in [((0,), (0,)), ((0, 0), (0, 0)), ((15, 16), (4, 5))]:
        x = rng.integers(10, size=shape)
        d = da.from_array(x, chunks=chunks)
        x_w = np.where(x)
        d_w = da.where(d)
        assert isinstance(d_w, type(x_w))
        assert len(d_w) == len(x_w)
        for i in range(len(x_w)):
            dd = d_w[i]
            if any(c != c for c in dd.shape):
                dd = dd.compute_chunk_sizes()
            np.testing.assert_array_equal(np.asarray(dd.compute()), x_w[i])


@pytest.mark.parametrize("axis", [None, 0, (1,), (0, 1)])
def test_count_nonzero_axis(axis):
    for shape, chunks in [((0, 0), (0, 0)), ((15, 16), (4, 5))]:
        x = rng.integers(10, size=shape)
        d = da.from_array(x, chunks=chunks)
        x_c = np.count_nonzero(x, axis)
        d_c = da.count_nonzero(d, axis)
        if d_c.shape == tuple():
            assert int(x_c) == int(d_c.compute())
        else:
            np.testing.assert_array_equal(np.asarray(d_c.compute()), x_c)


def test_nonzero_method():
    for shape, chunks in [((0,), (0,)), ((0, 0), (0, 0)), ((15, 16), (4, 5))]:
        x = rng.integers(10, size=shape)
        d = da.from_array(x, chunks=chunks)
        x_nz = x.nonzero()
        d_nz = d.nonzero()
        assert isinstance(d_nz, type(x_nz))
        assert len(d_nz) == len(x_nz)
        for i in range(len(x_nz)):
            dd = d_nz[i]
            if any(c != c for c in dd.shape):
                dd = dd.compute_chunk_sizes()
            np.testing.assert_array_equal(np.asarray(dd.compute()), x_nz[i])


# ---------------------------------------------------------------------------
# ravel_multi_index corner errors
# ---------------------------------------------------------------------------


def test_ravel_multi_index_unknown_shape_fails():
    multi_index1 = da.from_array(np.array([2, -1, 3, -1]), chunks=2)
    multi_index1 = multi_index1[multi_index1 > 0]
    assert np.isnan(multi_index1.shape).any()
    with pytest.raises(ValueError, match="[Cc]hunk"):
        da.ravel_multi_index([1, multi_index1], dims=(8, 9))


def test_ravel_multi_index_delayed_dims():
    dims = da.from_array(np.array([5, 10]))
    for wrapped in ([dims[0], dims[1]], dims):
        with pytest.raises(NotImplementedError, match="Dask types are not supported"):
            da.ravel_multi_index((2, 1), wrapped)


# ---------------------------------------------------------------------------
# coarsen / aligned_coarsen_chunks
# ---------------------------------------------------------------------------


def test_coarsen_with_excess():
    x = da.arange(10, chunks=5)
    np.testing.assert_array_equal(
        np.asarray(da.coarsen(np.min, x, {0: 5}, trim_excess=True).compute()),
        np.array([0, 5]),
    )
    np.testing.assert_array_equal(
        np.asarray(da.coarsen(np.sum, x, {0: 3}, trim_excess=True).compute()),
        np.array([0 + 1 + 2, 3 + 4 + 5, 6 + 7 + 8]),
    )


@pytest.mark.parametrize(
    "chunks, divisor",
    [((1, 1), 1), ((1, 1), 2), ((1, 1, 1), 2), ((10, 1), 10),
     ((20, 10, 15, 23, 24), 10), ((20, 10, 15, 23, 24), 8),
     ((10, 20, 30, 40, 2), 10), ((20, 10, 15, 42, 23, 24), 16),
     ((20, 10, 15, 47, 23, 24), 10), ((2, 10, 15, 47, 23, 24), 4)],
)
def test_aligned_coarsen_chunks(chunks, divisor):
    from dask_array_tpu.ops.routines import aligned_coarsen_chunks as acc

    aligned_chunks = acc(chunks, divisor)
    any_remainders = (np.array(aligned_chunks) % divisor) != 0
    valid_chunks = np.where((np.array(chunks) % divisor) == 0)[0]
    assert sum(aligned_chunks) == sum(chunks)
    assert [chunks[i] for i in valid_chunks] == [aligned_chunks[i] for i in valid_chunks]
    assert (np.array(aligned_chunks) > 0).all()
    assert len(aligned_chunks) <= len(chunks) + 1
    assert any_remainders.sum() in (0, 1)
    if any_remainders.sum() == 1:
        assert any_remainders[-1] == 1


# ---------------------------------------------------------------------------
# einsum broadcasting contractions
# ---------------------------------------------------------------------------


def test_einsum_broadcasting_contraction2():
    a = rng.random((1, 1, 5, 4))
    b = rng.random((4, 6))
    c = rng.random((5, 6))
    d = rng.random((7, 7))
    d_a = da.from_array(a, chunks=(1, 1, (2, 3), (2, 2)))
    d_b = da.from_array(b, chunks=((2, 2), (4, 2)))
    d_c = da.from_array(c, chunks=((2, 3), (4, 2)))
    d_d = da.from_array(d, chunks=(7, 3))
    assert_eq(np.einsum("abjk,kl,jl", a, b, c), da.einsum("abjk,kl,jl", d_a, d_b, d_c))
    np_res = np.einsum("abjk,kl,jl,ab->ab", a, b, c, d)
    da_res = da.einsum("abjk,kl,jl,ab->ab", d_a, d_b, d_c, d_d)
    assert_eq(np_res, da_res)
    mul_res = da.einsum("abjk,kl,jl", d_a, d_b, d_c) * d
    np.testing.assert_allclose(np.asarray(mul_res.compute()), np_res)


def test_einsum_broadcasting_contraction3():
    a = rng.random((1, 5, 4))
    b = rng.random((4, 1, 6))
    c = rng.random((5, 6))
    d = rng.random((7, 7))
    d_a = da.from_array(a, chunks=(1, (2, 3), (2, 2)))
    d_b = da.from_array(b, chunks=((2, 2), 1, (4, 2)))
    d_c = da.from_array(c, chunks=((2, 3), (4, 2)))
    d_d = da.from_array(d, chunks=(7, 3))
    assert_eq(np.einsum("ajk,kbl,jl,ab->ab", a, b, c, d),
              da.einsum("ajk,kbl,jl,ab->ab", d_a, d_b, d_c, d_d))


# ---------------------------------------------------------------------------
# average validation / keepdims
# ---------------------------------------------------------------------------


def test_average_keepdims():
    a = np.arange(6).reshape((3, 2))
    d_a = da.from_array(a, chunks=2)
    assert_eq(np.average(a, keepdims=True), da.average(d_a, keepdims=True))


def test_average_raises():
    d_a = da.arange(11, chunks=2)
    with pytest.raises(TypeError):
        da.average(d_a, weights=[1, 2, 3])
    # numpy raises ZeroDivisionError eagerly for all-zero weights; the traced
    # division yields nan on device (no host warning possible in-graph)
    assert np.isnan(float(da.average(d_a, weights=da.zeros_like(d_a)).compute()))


# ---------------------------------------------------------------------------
# tril / triu shapes + indices
# ---------------------------------------------------------------------------


def test_tril_ndims():
    A = rng.integers(0, 11, (10, 10, 10))
    dA = da.from_array(A, chunks=(5, 5, 5))
    assert_eq(da.triu(dA), np.triu(A))


def test_tril_triu_non_square_arrays():
    A = rng.integers(0, 11, (30, 35))
    dA = da.from_array(A, chunks=(5, 5))
    assert_eq(da.triu(dA), np.triu(A))
    assert_eq(da.tril(dA), np.tril(A))


@pytest.mark.parametrize(
    "n, k, m, chunks",
    [(3, 0, 3, "auto"), (3, 1, 3, "auto"), (3, -1, 3, "auto"), (5, 0, 5, 1)],
)
def test_tril_triu_indices(n, k, m, chunks):
    for da_f, np_f in [(da.tril_indices, np.tril_indices), (da.triu_indices, np.triu_indices)]:
        actual = da_f(n=n, k=k, m=m, chunks=chunks)[0]
        expected = np_f(n=n, k=k, m=m)[0]
        np.testing.assert_array_equal(np.asarray(actual.compute()), expected)


# ---------------------------------------------------------------------------
# push (ffill) along axes — numpy replica as the oracle (the reference uses
# bottleneck, absent from this image)
# ---------------------------------------------------------------------------


def _np_push(a, n, axis):
    out = np.copy(a)
    it = np.moveaxis(out, axis, 0)
    count = np.zeros(it.shape[1:], dtype=int)
    for i in range(1, it.shape[0]):
        mask = np.isnan(it[i])
        count = np.where(np.isnan(it[i - 1]) | ~mask, np.where(mask, count, 0), count + 1)
    # simple sequential ffill with optional limit
    it = np.moveaxis(out, axis, 0)
    last = np.full(it.shape[1:], np.nan)
    age = np.zeros(it.shape[1:], dtype=int)
    for i in range(it.shape[0]):
        row = it[i]
        m = np.isnan(row)
        age = np.where(m, age + 1, 0)
        last = np.where(m, last, row)
        fill = last if n is None else np.where(age <= n, last, np.nan)
        it[i] = np.where(m, fill, row)
    return out


def test_push():
    data = np.array([np.nan, 1, 2, np.nan, np.nan, np.nan, np.nan, 5, np.nan, np.nan])
    for chunks in [2, 3, 10]:
        x = da.from_array(data, chunks=chunks)
        for n in [None, 1, 2, 5, 10]:
            got = np.asarray(da.push(x, n, axis=0).compute())
            np.testing.assert_array_equal(got, _np_push(data, n, 0))


def test_push_2d_axis():
    data = np.random.default_rng(42).random((4, 12))
    data[data < 0.4] = np.nan
    x = da.from_array(data, chunks=(2, 5))
    for axis in [0, 1]:
        got = np.asarray(da.push(x, None, axis=axis).compute())
        np.testing.assert_array_equal(got, _np_push(data, None, axis))
