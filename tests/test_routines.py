import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.ops import routines as rt
from dask_array_tpu.ops.creation import diag, pad, tile, repeat, meshgrid, indices, fromfunction, tri
from dask_array_tpu.ops._fancy_indexing import take


def d_of(x, chunks):
    return da.from_array(x, chunks=chunks)


def test_where(rng):
    x = rng.standard_normal((8, 8))
    d = d_of(x, 4)
    assert_eq(rt.where(d > 0, d, -d), np.where(x > 0, x, -x))


def test_take_int_array(rng):
    x = rng.standard_normal((10, 6))
    d = d_of(x, (5, 3))
    idx = np.array([3, 1, 1, 9, 0, -1])
    assert_eq(take(d, idx, axis=0), np.take(x, idx, axis=0))
    assert_eq(d[idx], x[idx])
    assert_eq(d[:, [0, 5, 2]], x[:, [0, 5, 2]])
    assert_eq(d[[1, 2], 1:], x[[1, 2], 1:])


def test_bool_mask(rng):
    x = rng.standard_normal((8, 8))
    d = d_of(x, 4)
    mask = x > 0
    out = d[d > 0]
    assert np.isnan(out.shape[0])
    np.testing.assert_allclose(out.compute(), x[mask])
    m1 = x[:, 0] > 0
    np.testing.assert_allclose(d[m1].compute(), x[m1])


def test_vindex(rng):
    x = rng.standard_normal((9, 9))
    d = d_of(x, 3)
    out = d.vindex[[1, 3, 5], [2, 4, 6]]
    assert_eq(out, x[[1, 3, 5], [2, 4, 6]])


def test_setitem(rng):
    x = rng.standard_normal((6, 6))
    d = d_of(x.copy(), 3)
    d[2:4, :] = 7.0
    e = x.copy()
    e[2:4, :] = 7.0
    assert_eq(d, e)
    d2 = d_of(x.copy(), 3)
    d2[x > 0] = 0.0
    e2 = x.copy()
    e2[x > 0] = 0.0
    assert_eq(d2, e2)


def test_blocks_accessor(rng):
    x = rng.standard_normal((8, 9))
    d = d_of(x, (4, 3))
    assert_eq(d.blocks[0, 0], x[:4, :3])
    assert_eq(d.blocks[1], x[4:])
    assert_eq(d.blocks[:, 1], x[:, 3:6])
    assert_eq(d.blocks[[0, 1], 2], x[:, 6:9])
    assert d.blocks.shape == (2, 3)


def test_nonzero_unique(rng):
    x = (rng.standard_normal((7, 7)) > 0.3).astype(np.int64)
    d = d_of(x, 3)
    nz_d = rt.nonzero(d)
    nz_n = np.nonzero(x)
    for a, b in zip(nz_d, nz_n):
        np.testing.assert_array_equal(a.compute(), b)
    np.testing.assert_array_equal(rt.unique(d).compute(), np.unique(x))
    vals, counts = rt.unique(d, return_counts=True)
    np.testing.assert_array_equal(counts.compute(), np.unique(x, return_counts=True)[1])
    assert_eq(rt.count_nonzero(d), np.count_nonzero(x))
    np.testing.assert_array_equal(rt.argwhere(d).compute(), np.argwhere(x))


def test_bincount_digitize_searchsorted(rng):
    x = rng.integers(0, 9, size=40)
    d = d_of(x, 10)
    assert_eq(rt.bincount(d, minlength=10), np.bincount(x, minlength=10))
    y = rng.standard_normal(30)
    bins = np.linspace(-2, 2, 9)
    assert_eq(rt.digitize(d_of(y, 10), bins), np.digitize(y, bins))
    a = np.sort(rng.standard_normal(20))
    v = rng.standard_normal(7)
    assert_eq(rt.searchsorted(d_of(a, 5), d_of(v, 3)), np.searchsorted(a, v))


def test_diff_gradient(rng):
    x = rng.standard_normal((10, 8))
    d = d_of(x, 4)
    assert_eq(rt.diff(d, axis=0), np.diff(x, axis=0))
    assert_eq(rt.diff(d, n=2, axis=1), np.diff(x, n=2, axis=1))
    assert_eq(rt.ediff1d(d), np.ediff1d(x))
    g_d = rt.gradient(d, axis=0)
    assert_eq(g_d, np.gradient(x, axis=0))
    g2 = rt.gradient(d)
    for a, b in zip(g2, np.gradient(x)):
        assert_eq(a, b)


def test_cov_corrcoef_average(rng):
    x = rng.standard_normal((5, 40))
    d = d_of(x, (2, 10))
    assert_eq(rt.cov(d), np.cov(x), rtol=1e-8)
    assert_eq(rt.corrcoef(d), np.corrcoef(x), rtol=1e-8)
    w = rng.random(40)
    assert_eq(rt.average(d, axis=1, weights=w), np.average(x, axis=1, weights=w), rtol=1e-8)
    assert_eq(rt.ptp(d, axis=1), np.ptp(x, axis=1))


def test_cov_fweights_aweights(rng):
    # reference: tests/test_routines.py::test_cov_fweights/_aweights/_combined
    x = rng.standard_normal((4, 9))
    d = d_of(x, (2, 3))
    fw = rng.integers(1, 5, size=9)
    aw = rng.random(9) + 0.25

    assert_eq(rt.cov(d, fweights=fw), np.cov(x, fweights=fw), rtol=1e-8)
    assert_eq(rt.cov(d, aweights=aw), np.cov(x, aweights=aw), rtol=1e-8)
    assert_eq(
        rt.cov(d, fweights=fw, aweights=aw),
        np.cov(x, fweights=fw, aweights=aw),
        rtol=1e-8,
    )
    assert_eq(rt.cov(d, bias=1, fweights=fw), np.cov(x, bias=1, fweights=fw), rtol=1e-8)
    # lazy weights work too
    assert_eq(rt.cov(d, fweights=d_of(fw, 3)), np.cov(x, fweights=fw), rtol=1e-8)

    import pytest

    with pytest.raises(RuntimeError):
        rt.cov(d, fweights=np.ones((2, 9), dtype=np.int64))
    with pytest.raises(RuntimeError):
        rt.cov(d, fweights=np.ones(2, dtype=np.int64))
    with pytest.raises(RuntimeError):
        rt.cov(d, aweights=np.ones((2, 9)))
    with pytest.raises(RuntimeError):
        rt.cov(d, aweights=np.ones(2))
    with pytest.raises(TypeError):
        rt.cov(d, fweights=np.ones(9))  # non-integer fweights


def test_select_choose_compress(rng):
    x = rng.standard_normal((6, 6))
    d = d_of(x, 3)
    out = rt.select([d < -1, d > 1], [d * 0, d * 2], default=-5.0)
    exp = np.select([x < -1, x > 1], [x * 0, x * 2], default=-5.0)
    assert_eq(out, exp)
    cond = np.array([True, False, True, False, True, False])
    assert_eq(rt.compress(cond, d, axis=1), np.compress(cond, x, axis=1))
    assert_eq(rt.extract(d > 0, d), np.extract(x > 0, x), check_chunks=False)


def test_tri_diag(rng):
    x = rng.standard_normal((7, 7))
    d = d_of(x, 3)
    assert_eq(rt.tril(d), np.tril(x))
    assert_eq(rt.triu(d, 1), np.triu(x, 1))
    assert_eq(rt.diagonal(d), np.diagonal(x))
    assert_eq(rt.diagonal(d, offset=2), np.diagonal(x, offset=2))
    v = rng.standard_normal(5)
    assert_eq(diag(d_of(v, 2)), np.diag(v))
    assert_eq(diag(d_of(v, 2), k=1), np.diag(v, k=1))
    assert_eq(diag(d), np.diag(x))
    assert_eq(tri(5, 7, k=1, chunks=3), np.tri(5, 7, k=1))


def test_coarsen(rng):
    x = rng.standard_normal((12, 16))
    d = d_of(x, (4, 4))
    out = rt.coarsen(np.sum, d, {0: 2, 1: 4})
    exp = x.reshape(6, 2, 4, 4).sum(axis=(1, 3))
    assert_eq(out, exp, rtol=1e-10)
    # trim_excess
    y = rng.standard_normal((13,))
    out2 = rt.coarsen(np.mean, d_of(y, 5), {0: 3}, trim_excess=True)
    exp2 = y[:12].reshape(4, 3).mean(axis=1)
    assert_eq(out2, exp2, rtol=1e-10)


def test_pad_tile_repeat(rng):
    x = rng.standard_normal((5, 6))
    d = d_of(x, 3)
    assert_eq(pad(d, 2), np.pad(x, 2))
    assert_eq(pad(d, ((1, 2), (0, 3)), mode="edge"), np.pad(x, ((1, 2), (0, 3)), mode="edge"))
    assert_eq(pad(d, 1, mode="constant", constant_values=9.0), np.pad(x, 1, constant_values=9.0))
    assert_eq(tile(d, (2, 3)), np.tile(x, (2, 3)))
    assert_eq(repeat(d, 3, axis=1), np.repeat(x, 3, axis=1))
    assert_eq(repeat(d, [1, 0, 2, 1, 3], axis=0), np.repeat(x, [1, 0, 2, 1, 3], axis=0))


def test_meshgrid_indices_fromfunction():
    a = np.arange(4.0)
    b = np.arange(3.0)
    mg_d = meshgrid(da.from_array(a, chunks=2), da.from_array(b, chunks=2))
    mg_n = np.meshgrid(a, b)
    for u, v in zip(mg_d, mg_n):
        assert_eq(u, v)
    assert_eq(indices((3, 4)), np.indices((3, 4)), check_dtype=False)
    assert_eq(
        fromfunction(lambda i, j: i * 10 + j, shape=(4, 5), dtype="f8"),
        np.fromfunction(lambda i, j: i * 10 + j, shape=(4, 5), dtype="f8"),
    )


def test_topk(rng):
    x = rng.standard_normal((6, 20))
    d = d_of(x, (3, 5))
    out = rt.topk(d, 4, axis=1)
    exp = -np.sort(-x, axis=1)[:, :4]
    assert_eq(out, exp)
    out2 = rt.topk(d, -3, axis=1)
    exp2 = np.sort(x, axis=1)[:, :3]
    assert_eq(out2, exp2)
    ai = rt.argtopk(d, 2, axis=1).compute()
    np.testing.assert_array_equal(np.take_along_axis(x, ai, axis=1), exp[:, :2])


def test_insert_delete_append(rng):
    x = rng.standard_normal((6, 5))
    d = d_of(x, 3)
    assert_eq(rt.append(d, d, axis=0), np.append(x, x, axis=0))
    assert_eq(rt.delete(d, [1, 3], axis=0), np.delete(x, [1, 3], axis=0))
    assert_eq(rt.delete(d, 2, axis=1), np.delete(x, 2, axis=1))


def test_isin_union(rng):
    x = rng.integers(0, 10, (6, 6))
    d = d_of(x, 3)
    test = [1, 5, 7]
    assert_eq(rt.isin(d, test), np.isin(x, test))
    y = rng.integers(5, 15, 10)
    np.testing.assert_array_equal(
        rt.union1d(d, d_of(y, 4)).compute(), np.union1d(x, y)
    )


def test_misc():
    x = da.ones((4, 5), chunks=2)
    assert rt.ndim(x) == 2
    assert rt.shape(x) == (4, 5)
    assert rt.result_type(x, np.float32) == np.float64
    assert bool(rt.allclose(x, x).compute()) is True
    assert not rt.iscomplexobj(x)
    assert_eq(rt.isnull(x), np.zeros((4, 5), bool))
    assert_eq(rt.round(x * 1.234, 1), np.round(np.ones((4, 5)) * 1.234, 1))


def test_unify_chunks_function():
    a = da.ones((12, 12), chunks=(4, 6))
    b = da.ones((12, 12), chunks=(6, 4))
    chunkss, (a2, b2) = rt.unify_chunks(a, "ij", b, "jk")
    assert a2.chunks[1] == b2.chunks[0] == chunkss["j"]


def test_broadcast_arrays():
    a = da.ones((4, 1), chunks=2)
    b = da.ones((1, 5), chunks=2)
    u, v = rt.broadcast_arrays(a, b)
    assert u.shape == v.shape == (4, 5)
    assert_eq(u + v, np.full((4, 5), 2.0))


def test_review_regressions(rng):
    # diff with scalar prepend/append on 2-d (broadcast, not reshape)
    x = rng.standard_normal((3, 4))
    d = d_of(x, 2)
    assert_eq(rt.diff(d, prepend=0.0, axis=1), np.diff(x, prepend=0.0, axis=1))
    assert_eq(rt.diff(d, append=1.5, axis=0), np.diff(x, append=1.5, axis=0))
    # bincount counts values >= minlength (numpy grow-to-max semantics)
    b = rt.bincount(da.from_array(np.array([5, 1]), chunks=2), minlength=2)
    np.testing.assert_array_equal(b.compute(), np.bincount([5, 1], minlength=2))
    # ravel_multi_index mode='raise' actually raises on OOB
    with pytest.raises(ValueError):
        rt.ravel_multi_index((da.from_array(np.array([5]), chunks=1),), dims=(3,)).compute()
    ok = rt.ravel_multi_index(
        (da.from_array(np.array([1, 2]), chunks=1), da.from_array(np.array([0, 3]), chunks=1)),
        dims=(3, 4),
    )
    np.testing.assert_array_equal(ok.compute(), np.ravel_multi_index(([1, 2], [0, 3]), (3, 4)))
    # moment order 0 keepdims shape
    from dask_array_tpu.ops.reductions import moment

    m0 = moment(d, 0, axis=0, keepdims=True)
    assert m0.shape == (1, 4)
    # permutation respects chunks
    p = da.random.default_rng(0).permutation(12, chunks=4)
    assert p.chunks == ((4, 4, 4),)
    # take on unknown chunks raises the dask-style error
    masked = d[d[:, 0] > -np.inf]
    import dask_array_tpu.ops._fancy_indexing as fi

    with pytest.raises(ValueError, match="unknown chunk sizes"):
        fi.take(da.new_collection(
            da.from_array(x, chunks=2)[da.from_array(x[:, 0] > 0, chunks=2)].expr
        ), [0], axis=0)
