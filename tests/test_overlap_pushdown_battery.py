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
