"""Core end-to-end tests: creation, elemwise, slicing, transpose, reductions,
rechunk, concatenate — value parity vs numpy plus optimizer structure checks.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


def test_ones_compute():
    x = da.ones((10, 12), chunks=(5, 4))
    assert x.shape == (10, 12)
    assert x.chunks == ((5, 5), (4, 4, 4))
    assert x.dtype == np.float64
    assert_eq(x, np.ones((10, 12)))


def test_full_zeros_empty():
    assert_eq(da.zeros((6,), chunks=3), np.zeros((6,)))
    assert_eq(da.full((4, 4), 7, chunks=2), np.full((4, 4), 7))
    e = da.empty((3, 3), chunks=2)
    assert e.shape == (3, 3)
    e.compute()  # contents unspecified; must just run


def test_from_array_roundtrip(rng):
    x = rng.standard_normal((20, 15))
    d = da.from_array(x, chunks=(7, 6))
    assert d.chunks == ((7, 7, 6), (6, 6, 3))
    assert_eq(d, x)


def test_elemwise_binary(rng):
    x = rng.standard_normal((10, 10))
    y = rng.standard_normal((10, 10))
    dx = da.from_array(x, chunks=5)
    dy = da.from_array(y, chunks=5)
    assert_eq(dx + dy, x + y)
    assert_eq(dx * dy - dx / (dy + 10), x * y - x / (y + 10))
    assert_eq(dx > dy, x > y)
    assert_eq(-dx, -x)
    assert_eq(abs(dx), abs(x))
    assert_eq(2 * dx + 1, 2 * x + 1)


def test_elemwise_broadcast(rng):
    x = rng.standard_normal((8, 6))
    y = rng.standard_normal((6,))
    z = rng.standard_normal((8, 1))
    dx = da.from_array(x, chunks=(4, 3))
    dy = da.from_array(y, chunks=3)
    dz = da.from_array(z, chunks=(4, 1))
    assert_eq(dx + dy, x + y)
    assert_eq(dx + dz, x + z)
    assert (dx + dy).chunks == ((4, 4), (3, 3))


def test_elemwise_chunk_alignment(rng):
    x = rng.standard_normal((12,))
    a = da.from_array(x, chunks=4)
    b = da.from_array(x, chunks=3)
    out = a + b
    assert_eq(out, 2 * x)


def test_dtype_promotion():
    x = da.ones((4,), dtype="int32", chunks=2)
    y = da.ones((4,), dtype="float32", chunks=2)
    assert (x + y).dtype == np.promote_types("int32", "float32")
    assert (x + x).dtype == np.int32
    assert x.sum().dtype == np.int64  # numpy accumulator promotion
    assert x.astype("f8").dtype == np.float64


def test_basic_slicing(rng):
    x = rng.standard_normal((20, 24))
    d = da.from_array(x, chunks=(6, 8))
    assert_eq(d[:10], x[:10])
    assert_eq(d[3:17, 5:], x[3:17, 5:])
    assert_eq(d[::2, ::-3], x[::2, ::-3])
    assert_eq(d[5], x[5])
    assert_eq(d[:, 7], x[:, 7])
    assert_eq(d[-1, ::-1], x[-1, ::-1])
    assert_eq(d[..., 2], x[..., 2])
    assert_eq(d[None, 3:9], x[None, 3:9])


def test_slice_chunks_metadata():
    x = da.ones((100,), chunks=30)
    assert x[:50].chunks == ((30, 20),)
    assert x[10:40].chunks == ((20, 10),)
    assert x[::2].chunks == ((15, 15, 15, 5),)


def test_slice_of_slice_fuses():
    x = da.ones((100, 100), chunks=10)
    y = x[10:90][5:20]
    opt = y.expr.simplify()
    # one fused slice directly over the leaf
    from dask_array_tpu._slicing import Slice

    slices = [n for n in opt.walk() if isinstance(n, Slice)]
    assert len(slices) == 0 or len(slices) == 1
    assert_eq(y, np.ones((100, 100))[10:90][5:20])


def test_readme_example_slice_pushdown():
    """(x + x.T)[:100, :100] on ones((1000,1000), chunks=100) collapses to a
    fused blockwise over a 100x100 constant leaf (reference README example)."""
    x = da.ones((1000, 1000), chunks=(100, 100))
    y = (x + x.T)[:100, :100]
    opt = y.expr.optimize()
    from dask_array_tpu.ops.creation import BroadcastTrick

    leaves = [n for n in opt.walk() if isinstance(n, BroadcastTrick)]
    assert leaves, opt.tree_repr()
    for leaf in leaves:
        assert leaf.shape == (100, 100), leaf.shape
    from dask_array_tpu._slicing import Slice

    assert not [n for n in opt.walk() if isinstance(n, Slice)], opt.tree_repr()
    assert_eq(y, np.ones((100, 100)) * 2)


def test_transpose(rng):
    x = rng.standard_normal((6, 8, 10))
    d = da.from_array(x, chunks=(3, 4, 5))
    assert_eq(d.T, x.T)
    assert_eq(da.transpose(d, (2, 0, 1)), np.transpose(x, (2, 0, 1)))
    assert d.T.chunks == ((5, 5), (4, 4), (3, 3))
    # double transpose simplifies away
    assert (d.T.T).expr.simplify()._name == d.expr._name


def test_transpose_slice_pushdown(rng):
    x = rng.standard_normal((10, 20))
    d = da.from_array(x, chunks=5)
    y = d.T[2:5, 1:9]
    assert_eq(y, x.T[2:5, 1:9])
    opt = y.expr.simplify()
    from dask_array_tpu._slicing import Slice
    from dask_array_tpu.ops.manipulation import Transpose

    # slice moved below the transpose
    top = opt
    assert isinstance(top, Transpose), opt.tree_repr()


def test_reductions(rng):
    x = rng.standard_normal((12, 15))
    d = da.from_array(x, chunks=(4, 5))
    assert_eq(d.sum(), x.sum())
    assert_eq(d.sum(axis=0), x.sum(axis=0))
    assert_eq(d.sum(axis=1, keepdims=True), x.sum(axis=1, keepdims=True))
    assert_eq(d.mean(axis=0), x.mean(axis=0))
    assert_eq(d.max(), x.max())
    assert_eq(d.min(axis=1), x.min(axis=1))
    assert_eq(d.var(), x.var())
    assert_eq(d.std(axis=0), x.std(axis=0), rtol=1e-5)
    assert_eq(d.var(ddof=1), x.var(ddof=1))
    assert_eq((d > 0).any(axis=0), (x > 0).any(axis=0))
    assert_eq((d > 0).all(), (x > 0).all())
    assert_eq(d.argmax(axis=0), x.argmax(axis=0))
    assert_eq(d.argmin(), x.argmin())


def test_nan_reductions(rng):
    x = rng.standard_normal((10, 10))
    x[x > 1] = np.nan
    d = da.from_array(x, chunks=5)
    assert_eq(da.nansum(d), np.nansum(x))
    assert_eq(da.nanmean(d, axis=0), np.nanmean(x, axis=0))
    assert_eq(da.nanmax(d, axis=1), np.nanmax(x, axis=1))
    assert_eq(da.nanvar(d), np.nanvar(x))
    assert_eq(da.nanstd(d, axis=0), np.nanstd(x, axis=0), rtol=1e-5)


def test_cumulative(rng):
    x = rng.standard_normal((8, 9))
    d = da.from_array(x, chunks=(3, 4))
    assert_eq(d.cumsum(axis=0), x.cumsum(axis=0))
    assert_eq(d.cumprod(axis=1), x.cumprod(axis=1))
    assert_eq(da.cumsum(d, axis=1), np.cumsum(x, axis=1))


def test_generic_reduction(rng):
    import jax.numpy as jnp

    x = np.abs(rng.standard_normal((12, 12))) + 0.1
    d = da.from_array(x, chunks=3)
    out = da.reduction(d, jnp.sum, jnp.sum, axis=0, dtype="f8", split_every=2)
    assert_eq(out, x.sum(axis=0))


def test_reduction_slice_pushdown():
    x = da.ones((100, 100), chunks=10)
    y = x.sum(axis=0)[:20]
    opt = y.expr.simplify()
    from dask_array_tpu.ops.creation import BroadcastTrick

    leaves = [n for n in opt.walk() if isinstance(n, BroadcastTrick)]
    assert leaves and leaves[0].shape == (100, 20), opt.tree_repr()
    assert_eq(y, np.full(20, 100.0))


def test_rechunk(rng):
    x = rng.standard_normal((20, 20))
    d = da.from_array(x, chunks=5)
    r = d.rechunk((10, 4))
    assert r.chunks == ((10, 10), (4, 4, 4, 4, 4))
    assert_eq(r, x)
    # rechunk-of-rechunk collapses
    rr = r.rechunk(5)
    assert len([n for n in rr.expr.simplify().walk()]) <= 3


def test_rechunk_noop():
    x = da.ones((10,), chunks=5)
    assert x.rechunk(5).expr.simplify()._name == x.expr._name


def test_concatenate(rng):
    x = rng.standard_normal((4, 6))
    y = rng.standard_normal((3, 6))
    dx = da.from_array(x, chunks=(2, 3))
    dy = da.from_array(y, chunks=(3, 3))
    out = da.concatenate([dx, dy], axis=0)
    assert_eq(out, np.concatenate([x, y], axis=0))
    assert out.chunks == ((2, 2, 3), (3, 3))


def test_concatenate_slice_pushdown(rng):
    x = rng.standard_normal((4, 6))
    y = rng.standard_normal((6, 6))
    dx = da.from_array(x, chunks=2)
    dy = da.from_array(y, chunks=2)
    cat = da.concatenate([dx, dy], axis=0)
    # slice entirely within the second part: first part culled
    sub = cat[5:9]
    opt = sub.expr.simplify()
    from dask_array_tpu.ops._from_array import FromArray

    leaves = [n for n in opt.walk() if isinstance(n, FromArray)]
    assert len(leaves) == 1, opt.tree_repr()
    assert_eq(sub, np.concatenate([x, y])[5:9])


def test_stack(rng):
    x = rng.standard_normal((4, 5))
    y = rng.standard_normal((4, 5))
    dx, dy = da.from_array(x, chunks=2), da.from_array(y, chunks=2)
    assert_eq(da.stack([dx, dy], axis=0), np.stack([x, y], axis=0))
    assert_eq(da.stack([dx, dy], axis=2), np.stack([x, y], axis=2))
    assert_eq(da.vstack([dx, dy]), np.vstack([x, y]))
    assert_eq(da.hstack([dx, dy]), np.hstack([x, y]))


def test_arange_linspace():
    assert_eq(da.arange(17, chunks=5), np.arange(17))
    assert_eq(da.arange(2, 33, 3, chunks=4), np.arange(2, 33, 3))
    assert_eq(da.linspace(0.0, 1.0, 11, chunks=4), np.linspace(0, 1, 11))
    assert_eq(da.eye(9, chunks=3), np.eye(9))
    # arange slice pushdown stays an Arange leaf
    x = da.arange(100, chunks=10)[20:60]
    from dask_array_tpu.ops.creation import Arange

    opt = x.expr.simplify()
    assert isinstance(opt, Arange), opt.tree_repr()
    assert_eq(x, np.arange(100)[20:60])


def test_broadcast_to(rng):
    x = rng.standard_normal((5,))
    d = da.from_array(x, chunks=2)
    b = da.broadcast_to(d, (4, 5))
    assert_eq(b, np.broadcast_to(x, (4, 5)))
    assert b.chunks == ((4,), (2, 2, 1))


def test_squeeze_expand(rng):
    x = rng.standard_normal((4, 1, 5))
    d = da.from_array(x, chunks=(2, 1, 3))
    assert_eq(d.squeeze(), x.squeeze())
    assert_eq(da.expand_dims(d.squeeze(), 1), np.expand_dims(x.squeeze(), 1))


def test_flips_roll(rng):
    x = rng.standard_normal((6, 7))
    d = da.from_array(x, chunks=3)
    assert_eq(da.flipud(d), np.flipud(x))
    assert_eq(da.fliplr(d), np.fliplr(x))
    assert_eq(da.flip(d, 1), np.flip(x, 1))
    assert_eq(da.roll(d, 2, axis=0), np.roll(x, 2, axis=0))
    assert_eq(da.roll(d, -3, axis=1), np.roll(x, -3, axis=1))
    assert_eq(da.rot90(d), np.rot90(x))


def test_persist_name_stability(rng):
    x = rng.standard_normal((10, 10))
    d = da.from_array(x, chunks=5) + 1
    name_before = d.name
    p = d.persist()
    assert p.name == name_before
    assert_eq(p, x + 1)
    assert_eq(p + 1, x + 2)


def test_optimize_name_never_changes_collection():
    x = da.ones((10, 10), chunks=5)
    y = x + x.T
    raw_name = y.name
    _ = y.optimize()
    assert y.name == raw_name


def test_map_blocks(rng):
    import jax.numpy as jnp

    x = rng.standard_normal((8, 8))
    d = da.from_array(x, chunks=4)
    out = d.map_blocks(lambda b: b * 2, dtype=x.dtype)
    assert_eq(out, x * 2)

    def with_id(b, block_id=None):
        return b + block_id[0]

    out2 = d.map_blocks(with_id, dtype=x.dtype)
    expected = x.copy()
    expected[4:] += 1
    assert_eq(out2, expected)


def test_scalar_outputs():
    x = da.ones((4, 4), chunks=2)
    s = x.sum()
    assert s.shape == ()
    val = s.compute()
    assert val == 16.0
    assert float(s) == 16.0


def test_fusion_wraps_groups():
    x = da.ones((100, 100), chunks=50)
    y = ((x + 1) * 2).expr.optimize()
    from dask_array_tpu._blockwise import FusedBlockwise

    assert isinstance(y, FusedBlockwise), y.tree_repr()


def test_shuffle(rng):
    x = rng.standard_normal((10, 4))
    d = da.from_array(x, chunks=(5, 2))
    idx = [[1, 5, 2], [0, 3], [9, 8, 7, 6, 4]]
    out = d.shuffle(idx, axis=0)
    flat = [i for g in idx for i in g]
    assert_eq(out, x[flat])


def test_mean_median_quantile(rng):
    x = rng.standard_normal((9, 12))
    d = da.from_array(x, chunks=(3, 4))
    assert_eq(da.median(d, axis=0), np.median(x, axis=0))
    assert_eq(da.quantile(d, 0.5, axis=1), np.quantile(x, 0.5, axis=1))
    assert_eq(da.percentile(da.from_array(x[0], chunks=4), [25, 50, 75]), np.percentile(x[0], [25, 50, 75]))
