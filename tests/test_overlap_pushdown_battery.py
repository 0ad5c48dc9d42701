"""Slice-through-overlap + overlap optimizer structural battery.

Ports the CASES of the reference's ``tests/test_slice_through_overlap.py``
(618 LoC, 31 tests) and ``test_overlap_optimizer.py``.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._slicing import Slice
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.ops._from_array import FromArray
from dask_array_tpu.ops._overlap import Overlap, map_overlap, overlap, trim_internal


@pytest.fixture
def rng():
    return np.random.default_rng(47)


def leaf_chunks(expr):
    return [n.chunks for n in expr.walk() if isinstance(n, FromArray)]


def _np_overlap_1d(x, depth, boundary, axis=0):
    """numpy mirror for overlap blocks assembled back (identity check)."""
    return x


def test_slice_through_overlap_non_overlap_axis(rng):
    x = rng.standard_normal((16, 20))
    d = da.from_array(x, chunks=(8, 5))
    g = overlap(d, depth={0: 2}, boundary={0: "reflect"})
    y = g[:, 5:15]
    opt = y.expr.simplify()
    # the column slice (no halo there) pushed below the overlap
    lcs = leaf_chunks(opt)
    assert lcs and sum(lcs[0][1]) == 10, opt.tree_repr()
    # 2 row blocks of 8, each grown by 2+2 reflect halo
    assert y.shape == (24, 10)


def test_slice_on_overlap_axis_stays_above(rng):
    x = rng.standard_normal((16, 8))
    d = da.from_array(x, chunks=(4, 8))
    g = overlap(d, depth={0: 1}, boundary={0: "reflect"})
    y = g[2:20]
    opt = y.expr.simplify()
    # a slice on the halo axis must NOT corrupt halo structure
    lcs = leaf_chunks(opt)
    assert lcs and sum(lcs[0][0]) == 16, opt.tree_repr()


@pytest.mark.parametrize(
    "shape,chunks,depth,slc",
    [
        ((24,), 6, {0: 2}, np.s_[:]),
        ((24, 10), (6, 5), {0: 1}, np.s_[:, 2:8]),
        ((24, 10), (6, 5), {0: 1, 1: 1}, np.s_[:, :]),
        ((12, 12, 6), 3, {1: 1}, np.s_[2:10, :, 1:5]),
    ],
)
def test_map_overlap_slice_correctness(rng, shape, chunks, depth, slc):
    x = rng.standard_normal(shape)
    d = da.from_array(x, chunks=chunks)
    boundary = {ax: "reflect" for ax in depth}
    y = map_overlap(lambda b: b * 2.0, d, depth=depth, boundary=boundary, dtype=x.dtype)[slc]
    assert_eq(y, (x * 2.0)[slc])


def test_map_overlap_identity_roundtrip(rng):
    # overlap then trim with no function = identity, all boundaries
    x = rng.standard_normal((20, 12))
    d = da.from_array(x, chunks=(5, 6))
    for bd in ("reflect", "periodic", "nearest", 0.0):
        y = map_overlap(lambda b: b, d, depth=1, boundary=bd, dtype=x.dtype)
        assert_eq(y, x)


def test_overlap_block_contents_reflect(rng):
    # the halo blocks contain the right neighbor values
    x = np.arange(12.0)
    d = da.from_array(x, chunks=4)
    g = overlap(d, depth={0: 2}, boundary={0: "reflect"})
    blocks = np.asarray(g.compute())
    # assembled overlap: [refl(2) + block0 + halo] ...
    assert g.chunks == ((8, 8, 8),)
    np.testing.assert_array_equal(blocks[:8], [1, 0, 0, 1, 2, 3, 4, 5])


def test_overlap_block_contents_periodic(rng):
    x = np.arange(8.0)
    d = da.from_array(x, chunks=4)
    g = overlap(d, depth={0: 1}, boundary={0: "periodic"})
    blocks = np.asarray(g.compute())
    np.testing.assert_array_equal(blocks[:6], [7, 0, 1, 2, 3, 4])


def test_overlap_boundary_none_edges(rng):
    x = np.arange(12.0)
    d = da.from_array(x, chunks=4)
    g = overlap(d, depth={0: 1}, boundary={0: "none"})
    # edge blocks get no outer halo
    assert g.chunks == ((5, 6, 5),)


def test_asymmetric_overlap_none(rng):
    x = rng.standard_normal((16,))
    d = da.from_array(x, chunks=4)
    g = overlap(d, depth={0: (2, 0)}, boundary={0: "none"})
    assert g.chunks == ((4, 6, 6, 6),)
    y = trim_internal(g, {0: (2, 0)}, {0: "none"})
    assert_eq(y, x)


def test_zero_depth_overlap_is_cheap(rng):
    x = rng.standard_normal((12,))
    d = da.from_array(x, chunks=4)
    g = overlap(d, depth={0: 0}, boundary={0: "reflect"})
    assert g.chunks == ((4, 4, 4),)
    assert_eq(g, x)


def test_depth_exceeds_chunk_rechunks(rng):
    x = rng.standard_normal((20,))
    d = da.from_array(x, chunks=2)
    y = map_overlap(lambda b: b, d, depth=5, boundary="reflect", dtype=x.dtype)
    assert_eq(y, x)


def test_depth_exceeds_chunk_disallowed_raises(rng):
    d = da.from_array(rng.standard_normal((20,)), chunks=2)
    with pytest.raises(ValueError, match="rechunk"):
        overlap(d, depth={0: 5}, boundary={0: "reflect"}, allow_rechunk=False)


def test_2d_overlap_stencil_values(rng):
    import jax.numpy as jnp

    x = rng.standard_normal((32, 32)).astype("f4")
    d = da.from_array(x, chunks=8)

    def lap(b):
        return (
            jnp.roll(b, 1, 0) + jnp.roll(b, -1, 0)
            + jnp.roll(b, 1, 1) + jnp.roll(b, -1, 1) - 4 * b
        )

    y = map_overlap(lap, d, depth=1, boundary="reflect", dtype="f4")
    pad = np.pad(x, 1, mode="symmetric")  # dask reflect = edge-inclusive
    want = pad[:-2, 1:-1] + pad[2:, 1:-1] + pad[1:-1, :-2] + pad[1:-1, 2:] - 4 * x
    assert_eq(y, want, rtol=1e-5)


def test_map_overlap_exposes_input_as_dependency(rng):
    # the optimizer must see THROUGH map_overlap to simplify its input
    x = rng.standard_normal((16, 16))
    d = da.from_array(x, chunks=4)
    y = map_overlap(lambda b: b + 1, (d * 2)[:8], depth=1, boundary="reflect", dtype=x.dtype)
    opt = y.expr.simplify()
    lcs = leaf_chunks(opt)
    # the input slice reached the leaf
    assert lcs and sum(lcs[0][0]) == 8, opt.tree_repr()
    assert_eq(y, (x * 2)[:8] + 1)


def test_map_overlap_no_trim_shape(rng):
    x = rng.standard_normal((12,))
    d = da.from_array(x, chunks=4)
    y = map_overlap(lambda b: b, d, depth=1, boundary="reflect", trim=False, dtype=x.dtype)
    assert y.shape == (18,)  # 3 blocks x (4 + 2 halo)


def test_sliding_window_view_fusion_into_reduce_window(rng):
    # SlidingWindowView -> Reduction rewrites into one SlidingWindowReduce
    from dask_array_tpu.ops._sliding import SlidingWindowReduce

    x = rng.standard_normal((64,))
    d = da.from_array(x, chunks=16)
    w = da.sliding_window_view(d, 5, axis=0)
    y = w.sum(axis=-1)
    opt = y.expr.simplify()
    assert any(isinstance(n, SlidingWindowReduce) for n in opt.walk()), opt.tree_repr()
    expected = np.lib.stride_tricks.sliding_window_view(x, 5).sum(axis=-1)
    assert_eq(y, expected)


def test_sliding_window_view_shared_consumer_declines_fusion(rng):
    x = rng.standard_normal((32,))
    d = da.from_array(x, chunks=8)
    w = da.sliding_window_view(d, 3, axis=0)
    y = w.sum(axis=-1) + w.max(axis=-1)
    sw = np.lib.stride_tricks.sliding_window_view(x, 3)
    assert_eq(y, sw.sum(axis=-1) + sw.max(axis=-1))


def test_push_ffill(rng):
    x = rng.standard_normal((24,))
    x[[3, 4, 10, 23]] = np.nan
    d = da.from_array(x, chunks=6)
    got = np.asarray(da.push(d, axis=0).compute())
    want = x.copy()
    for i in range(1, len(want)):
        if np.isnan(want[i]):
            want[i] = want[i - 1]
    np.testing.assert_allclose(got, want)


def test_trim_internal_matches_overlap_inverse(rng):
    x = rng.standard_normal((18, 12))
    d = da.from_array(x, chunks=(6, 6))
    g = overlap(d, depth={0: 2, 1: 1}, boundary={0: "reflect", 1: "nearest"})
    y = trim_internal(g, {0: 2, 1: 1}, {0: "reflect", 1: "nearest"})
    assert_eq(y, x)


# -- round-3 additions: the rest of the reference's slice-through-overlap
#    spine (value-correctness cases adapted to this architecture) ------------


def _add_neighbors(x):
    # pure (jax-traceable AND numpy-compatible) neighbor sum along axis 0
    import jax.numpy as jnp

    if x.shape[0] <= 4:
        return x
    core = x[2:-2, :] + x[:-4, :] + x[4:, :]
    return jnp.concatenate([x[:2, :], core, x[-2:, :]], axis=0)


def _add_neighbors_2d(x):
    import jax.numpy as jnp

    out = _add_neighbors(x)
    if x.shape[1] <= 4:
        return out
    core = out[:, 2:-2] + x[:, :-4] + x[:, 4:]
    return jnp.concatenate([out[:, :2], core, out[:, -2:]], axis=1)


def _lag1(x):
    import jax.numpy as jnp

    pad = jnp.full_like(x[:1], jnp.nan)
    return jnp.concatenate([pad, x[:-1]], axis=0)


def test_slice_through_overlap_middle_slice(rng):
    arr = np.arange(2500).reshape((50, 50)).astype(float)
    x = da.from_array(arr, chunks=(10, 10))
    result = map_overlap(_add_neighbors, x, depth={0: 2, 1: 0}, boundary="none")
    # block-aligned middle slice pushes the leaf window down
    sliced = result[:, 20:40]
    assert_eq(sliced, result.compute()[:, 20:40])
    lcs = leaf_chunks(sliced.expr.simplify())
    assert lcs and sum(lcs[0][1]) == 20
    # an off-grid middle slice stays above (values still exact)
    off = result[:, 15:35]
    assert_eq(off, result.compute()[:, 15:35])


def test_slice_on_overlap_axis_value_correctness(rng):
    arr = np.arange(2500).reshape((50, 50)).astype(float)
    x = da.from_array(arr, chunks=(10, 10))
    result = map_overlap(_add_neighbors_2d, x, depth=2, boundary="none")
    sliced = result[:25, :25]
    assert_eq(sliced, result.compute()[:25, :25])


def test_slice_on_both_axes_one_has_overlap(rng):
    arr = np.arange(2500).reshape((50, 50)).astype(float)
    x = da.from_array(arr, chunks=(10, 10))
    result = map_overlap(_add_neighbors, x, depth={0: 2, 1: 0}, boundary="none")
    assert_eq(result[:25, :25], result.compute()[:25, :25])


def test_map_overlap_uniform_depth_correctness(rng):
    arr = rng.standard_normal((24, 24))
    x = da.from_array(arr, chunks=(8, 8))
    result = map_overlap(_add_neighbors_2d, x, depth=2, boundary="reflect")
    # compare to a single whole-array application (locality contract)
    padded = np.pad(arr, 2, mode="symmetric")
    want = _add_neighbors_2d(padded)[2:-2, 2:-2]
    np.testing.assert_allclose(result.compute(), want, rtol=1e-12)


def test_tail_slice_with_asymmetric_positive_overlap(rng):
    day = 24
    depth = 3 * day - 1
    arr = np.arange(13 * day, dtype="float64")
    x = da.from_array(arr, chunks=(day,))

    def lead1(block):
        result = np.full_like(block, np.nan)
        result[:-1] = block[1:]
        return result

    full = map_overlap(lead1, x, depth={0: (0, depth)}, boundary="none", trim=True)
    result = full[-day:]
    got = result.compute()
    want = full.compute()[-day:]
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(np.nan_to_num(got), np.nan_to_num(want))


def test_tail_slice_with_second_input_asymmetric_overlap(rng):
    arr = np.arange(50, dtype="float64")
    x = da.from_array(arr, chunks=(10,))
    y = da.from_array(arr * 2, chunks=(10,))
    full = map_overlap(
        lambda a, b: a + b,
        x,
        y,
        depth=[{0: 0}, {0: (0, 25)}],
        boundary=["none", "none"],
        trim=True,
    )
    result = full[-10:]
    np.testing.assert_allclose(result.compute(), (arr * 3)[-10:])


def test_periodic_edge_slice_keeps_global_boundary_context(rng):
    arr = np.arange(10, dtype="float64")
    x = da.from_array(arr, chunks=(5,))
    full = map_overlap(_lag1, x, depth={0: 1}, boundary="periodic", trim=True)
    got = full[:3].compute()
    want = full.compute()[:3]
    np.testing.assert_allclose(got, want)
    # periodic: position 0 lags from the LAST element
    assert got[0] == arr[-1]


def test_overlap_axis_slice_with_no_rechunk(rng):
    arr = np.arange(40, dtype="float64")
    x = da.from_array(arr, chunks=(20,))
    full = map_overlap(
        lambda block: block, x, depth={0: 10}, boundary="none", trim=True,
        allow_rechunk=False,
    )
    np.testing.assert_allclose(full[5:15].compute(), arr[5:15])


def test_nested_overlap_tail_slice_after_rechunk(rng):
    arr = np.arange(30, dtype="float64").reshape(15, 2)
    x = da.from_array(arr, chunks=(3, 2))
    inner = map_overlap(lambda b: b, x, depth={0: 4, 1: 0}, boundary="none", trim=True)
    outer = map_overlap(
        lambda b: b, inner.rechunk((5, 2)), depth={0: 2, 1: 0}, boundary="none", trim=True
    )
    np.testing.assert_allclose(outer[-5:].compute(), arr[-5:])


def test_slice_pushdown_into_nested_overlap_is_correct(rng):
    arr = rng.standard_normal((40, 4))
    x = da.from_array(arr, chunks=(8, 4))
    inner = map_overlap(_lag1, x, depth={0: 1, 1: 0}, boundary="none", trim=True)
    outer = map_overlap(_lag1, inner, depth={0: 1, 1: 0}, boundary="none", trim=True)
    got = outer[10:30].compute()
    want = outer.compute()[10:30]
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(np.nan_to_num(got), np.nan_to_num(want))


@pytest.mark.parametrize("chunks", [(5, 25), (25, 5), (7, 23)])
def test_map_overlap_short_boundary_chunk_trailing_window(rng, chunks):
    arr = np.arange(30, dtype="float64")
    x = da.from_array(arr, chunks=(chunks,))
    full = map_overlap(_lag1, x, depth={0: (1, 0)}, boundary="none", trim=True)
    got = full.compute()
    assert np.isnan(got[0]) and np.allclose(got[1:], arr[:-1])


def test_map_overlap_short_boundary_chunk_leading_window(rng):
    arr = np.arange(30, dtype="float64")
    x = da.from_array(arr, chunks=((2, 28),))

    def lead1(block):
        result = np.full_like(block, np.nan)
        result[:-1] = block[1:]
        return result

    full = map_overlap(lead1, x, depth={0: (0, 1)}, boundary="none", trim=True)
    got = full.compute()
    assert np.isnan(got[-1]) and np.allclose(got[:-1], arr[1:])


def test_slice_ending_inside_first_window_values(rng):
    # slicing to fewer rows than the window depth must not hand the kernel
    # an undersized block (reference :596 declines the pushdown)
    arr = np.arange(150, dtype="float64")
    x = da.from_array(arr, chunks=(30,))
    full = map_overlap(_lag1, x, depth={0: 29}, boundary="none", trim=True)
    got = full[:29].compute()
    want = full.compute()[:29]
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(np.nan_to_num(got), np.nan_to_num(want))


# -- remaining reference spine cases (reference :152-199,240-330,471-502,612) --


def _add_neighbors_1d(b):
    b = np.asarray(b)
    out = b.copy()
    out[1:-1] += b[:-2] + b[2:]
    return out


def test_slice_through_2d_overlap_nonoverlap_axis_shrinks_leaf(rng):
    arr = np.arange(10000).reshape((100, 100)).astype(float)
    x = da.from_array(arr, chunks=(10, 10))
    result = map_overlap(_add_neighbors_1d, x, depth={0: 2, 1: 0}, boundary="none")
    sliced = result[:, :40]
    lcs = leaf_chunks(sliced.expr.simplify())
    assert lcs and sum(lcs[0][1]) == 40  # columns culled below the halo
    assert_eq(sliced, result.compute()[:, :40])


def test_slice_through_2d_overlap_middle_nonoverlap_axis(rng):
    arr = np.arange(10000).reshape((100, 100)).astype(float)
    x = da.from_array(arr, chunks=(10, 10))
    result = map_overlap(_add_neighbors_1d, x, depth={0: 2, 1: 0}, boundary="none")
    sliced = result[:, 20:70]
    lcs = leaf_chunks(sliced.expr.simplify())
    assert lcs and sum(lcs[0][1]) == 50
    assert_eq(sliced, result.compute()[:, 20:70])


def test_slice_through_1d_overlap_on_3d_array(rng):
    arr = np.arange(1000).reshape((10, 10, 10)).astype(float)
    x = da.from_array(arr, chunks=(5, 5, 5))
    result = map_overlap(_add_neighbors_1d, x, depth={0: 1, 1: 0, 2: 0}, boundary="none")
    sliced = result[:, :3, :3]
    # both non-overlap axes pushed; the halo axis keeps its full window
    assert leaf_chunks(sliced.expr.simplify()) == [((5, 5), (5,), (5,))]
    assert_eq(sliced, result.compute()[:, :3, :3])


def test_slice_through_zero_overlap_pushes(rng):
    arr = np.arange(10000).reshape((100, 100)).astype(float)
    x = da.from_array(arr, chunks=(10, 10))
    result = map_overlap(_add_neighbors_1d, x, depth=0, boundary="none")
    sliced = result[:50, :]
    lcs = leaf_chunks(sliced.expr.simplify())
    assert lcs and sum(lcs[0][0]) == 50  # zero halo: the slice pushes fully
    assert_eq(sliced, result.compute()[:50, :])


def test_slice_through_overlap_reduces_numblocks(rng):
    arr = np.arange(10000).reshape((100, 100)).astype(float)
    x = da.from_array(arr, chunks=(10, 10))
    result = map_overlap(_add_neighbors_1d, x, depth={0: 2, 1: 0}, boundary="none")
    assert result.numblocks == (10, 10)
    sliced = result[:, :10]
    assert sliced.numblocks == (10, 1)
    assert leaf_chunks(sliced.expr.simplify()) == [((10,) * 10, (10,))]


@pytest.mark.parametrize(
    "depth,slc",
    [
        ({0: 2, 1: 0}, np.s_[:, :20]),
        ({0: 0, 1: 2}, np.s_[:20, :]),
        ({0: 2, 1: 0}, np.s_[:, 20:60]),
        ({0: 0, 1: 2}, np.s_[20:60, :]),
        ({0: 2, 1: 0}, np.s_[:, 40:]),
        ({0: 0, 1: 2}, np.s_[40:, :]),
    ],
)
def test_slice_through_overlap_value_matrix(rng, depth, slc):
    # the reference's (80, 80) start/middle/end matrix on non-overlap axes
    arr = rng.standard_normal((80, 80))
    x = da.from_array(arr, chunks=(20, 20))
    result = map_overlap(_add_neighbors_1d, x, depth=depth, boundary="none")
    assert_eq(result[slc], result.compute()[slc])


def test_nested_overlap_lowers_in_linear_work(rng):
    # a 12-deep map_overlap chain must optimize in O(depth), not O(2^depth)
    # (the reference regression took ~40 s at depth 16 when it blew up)
    import time

    y = da.ones((70, 5), chunks=(10, 5))
    for _ in range(12):
        y = map_overlap(lambda b: b, y, depth={0: 1}, boundary="none")
    t0 = time.time()
    y.expr.optimize(fuse=False)
    assert time.time() - t0 < 10.0
    np.testing.assert_allclose(y.compute(), 1.0)


def test_nested_overlap_tail_slice_with_short_first_chunk(rng):
    # shift stacked on a trailing window, tail-sliced, merged first chunk
    arr = np.arange(160, dtype="float64").reshape(40, 4)
    x = da.from_array(arr, chunks=((9, 10, 10, 11), (4,)))

    def trailing_window_sum(b):
        b = np.asarray(b)
        out = np.full_like(b, np.nan)
        for i in range(b.shape[0]):
            lo = i - 9
            if lo >= 0:
                out[i] = b[lo : i + 1].sum(axis=0)
        return out

    inner = map_overlap(
        trailing_window_sum, x, depth={0: (9, 0), 1: 0}, boundary="none",
        trim=True, dtype="float64",
    )
    outer = map_overlap(
        _lag1, inner, depth={0: (1, 0), 1: 0}, boundary="none",
        trim=True, dtype="float64",
    )
    got = outer[35:].compute()
    want = outer.compute()[35:]
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(np.nan_to_num(got), np.nan_to_num(want))


def test_tail_slice_inside_last_window_declines_pushdown(rng):
    # leading-window analog of the first-window decline: a tail slice whose
    # expanded extent is shorter than one kernel window must not hand the
    # kernel an undersized block
    arr = np.arange(160, dtype="float64").reshape(40, 4)
    x = da.from_array(arr, chunks=((10,) * 4, (4,)))

    def leading_window_sum(b):
        b = np.asarray(b)
        out = np.full_like(b, np.nan)
        n = b.shape[0]
        for i in range(n):
            if i + 10 <= n:
                out[i] = b[i : i + 10].sum(axis=0)
        return out

    r = map_overlap(
        leading_window_sum, x, depth={0: (0, 9), 1: 0}, boundary="none",
        trim=True, dtype="float64",
    )
    full = r.compute()
    for slc in [np.s_[-9:], np.s_[-10:]]:
        got = r[slc].compute()
        want = full[slc]
        np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
        np.testing.assert_allclose(np.nan_to_num(got), np.nan_to_num(want))
