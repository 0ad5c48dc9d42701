"""Regression tests for the round-1 VERDICT/ADVICE correctness fixes."""

import math

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


# -- tokenize: container part-boundary collisions (ADVICE item 1) -----------


def test_tokenize_set_boundary_no_collision():
    from dask_array_tpu.utils._tokenize import tokenize

    assert tokenize({(1, 2)}) != tokenize({(12,)})
    assert tokenize(frozenset([(1, 2)])) != tokenize(frozenset([(12,)]))
    assert tokenize({("a", "bc")}) != tokenize({("ab", "c")})
    # still deterministic
    assert tokenize({(1, 2)}) == tokenize({(1, 2)})


def test_tokenize_partial_boundary_no_collision():
    import functools

    from dask_array_tpu.utils._tokenize import tokenize

    p1 = functools.partial(np.sum, axis=(1, 2))
    p2 = functools.partial(np.sum, axis=(12,))
    assert tokenize(p1) != tokenize(p2)


# -- graded _moved_fraction (VERDICT weak item 5) ----------------------------


def test_moved_fraction_graded():
    from dask_array_tpu._rechunk import _axis_moved_fraction, _moved_fraction

    # heal a sliver: only the sliver moves
    assert _axis_moved_fraction((1, 719, 720), (720, 720)) == pytest.approx(
        1 / 1440
    )
    # true merge moves all but the largest member of each run
    assert _axis_moved_fraction((10,) * 6, (30, 30)) == pytest.approx(2 / 3)
    # splits are free
    assert _axis_moved_fraction((30, 30), (10,) * 6) == 0.0
    # half-chunk shift
    assert _axis_moved_fraction((100,) * 4, (50, 100, 100, 100, 50)) == pytest.approx(0.375)
    # identity
    assert _axis_moved_fraction((5, 5), (5, 5)) == 0.0
    # multi-axis composition: stay fractions multiply
    f = _moved_fraction(((30, 30), (10,) * 6), ((10,) * 6, (30, 30)))
    assert f == pytest.approx(1 - (1.0 * (1 - 2 / 3)))


def test_rechunk_transfer_bytes_graded(rng):
    x = da.from_array(rng.standard_normal((1440,)), chunks=(1, 719, 720))
    r = x.rechunk((720, 720))
    lo, hi = r.expr.transfer_bytes()
    nbytes = 1440 * 8
    assert lo == pytest.approx(nbytes / 1440, abs=1)  # ~one element moves
    assert 0 < lo < nbytes / 100  # graded, not all-or-nothing
    assert hi == nbytes


@pytest.fixture
def rng():
    return np.random.default_rng(11)


# -- compute_chunk_sizes preserves the grid (VERDICT weak item 7) ------------


def test_compute_chunk_sizes_preserves_grid(rng):
    x = rng.standard_normal((40,))
    d = da.from_array(x, chunks=10)
    mask = x > 0
    dm = da.from_array(mask, chunks=10)
    filtered = d[dm]
    assert math.isnan(filtered.shape[0])
    resolved = filtered.compute_chunk_sizes()
    # grid preserved: one (now-known) chunk per original block
    assert len(resolved.chunks[0]) == 4
    assert all(isinstance(c, int) for c in resolved.chunks[0])
    assert sum(resolved.chunks[0]) == int(mask.sum())
    assert_eq(resolved, x[mask])
    # downstream rechunk-dependent code now works
    assert_eq(resolved.rechunk(5), x[mask])


def test_compute_chunk_sizes_known_noop(rng):
    d = da.from_array(rng.standard_normal((8,)), chunks=4)
    assert d.compute_chunk_sizes() is d


# -- lazy histogram range (VERDICT weak item 6) -------------------------------


def test_histogram_lazy_range_no_eager_compute(rng, monkeypatch):
    """Building histogram(a, bins=N) must not trigger computation."""
    import dask_array_tpu._materialize as mat

    x = rng.standard_normal((100,))
    d = da.from_array(x, chunks=25)

    calls = []
    orig = mat.compute_expr

    def spy(expr, optimize=True):
        calls.append(expr)
        return orig(expr, optimize)

    monkeypatch.setattr(mat, "compute_expr", spy)
    h, edges = da.histogram(d, bins=10)
    assert calls == []  # graph build is compute-free
    eh, ee = np.histogram(x, bins=10)
    assert_eq(h, eh)
    assert_eq(edges, ee)


def test_histogram_lazy_dask_range(rng):
    x = rng.standard_normal((64,))
    d = da.from_array(x, chunks=16)
    lo, hi = d.min(), d.max()
    h, edges = da.histogram(d, bins=8, range=(lo, hi))
    eh, ee = np.histogram(x, bins=8, range=(x.min(), x.max()))
    assert_eq(h, eh)
    assert_eq(edges, ee)


def test_histogram_degenerate_range():
    x = np.full(10, 3.0)
    d = da.from_array(x, chunks=5)
    h, edges = da.histogram(d, bins=4)
    eh, ee = np.histogram(x, bins=4)
    assert_eq(h, eh)
    assert_eq(edges, ee)


def test_histogramdd_lazy_range(rng):
    x = rng.standard_normal((50,))
    y = rng.standard_normal((50,))
    dx = da.from_array(x, chunks=25)
    dy = da.from_array(y, chunks=25)
    h, edges = da.histogramdd((dx, dy), bins=(4, 5))
    eh, ee = np.histogramdd((x, y), bins=(4, 5))
    assert_eq(h, eh)
    for got, exp in zip(edges, ee):
        assert_eq(got, exp)


# -- executor cache: stable mesh identity (ADVICE item 3) ---------------------


def test_mesh_cache_key_stable():
    import jax
    from jax.sharding import Mesh

    from dask_array_tpu._executor import _mesh_key

    devs = np.asarray(jax.devices("cpu")[:4]).reshape(2, 2)
    m1 = Mesh(devs, ("a", "b"))
    m2 = Mesh(devs, ("a", "b"))
    assert _mesh_key(m1) == _mesh_key(m2)  # identity survives re-creation
    m3 = Mesh(devs.T, ("a", "b"))
    assert _mesh_key(m1) != _mesh_key(m3)  # device order matters
    assert _mesh_key(None) is None


# -- second code-review round fixes -------------------------------------------


def test_map_overlap_short_depth_list_raises(rng):
    import dask_array_tpu as da2

    a = da.from_array(rng.standard_normal((8,)), chunks=4)
    b = da.from_array(rng.standard_normal((8,)), chunks=4)
    with pytest.raises(ValueError, match="one entry per array"):
        da.map_overlap(lambda x, y: x + y, a, b, depth=[1], boundary="none")


def test_reduction_split_every_one_clamped(rng):
    x = rng.standard_normal((12,))
    d = da.from_array(x, chunks=2)
    out = da.reduction(d, np.sum, np.sum, axis=0, dtype="f8", split_every={0: 1})
    assert_eq(out, x.sum())  # a fan-in of 1 used to collapse to ONE block


def test_vindex_too_many_indices(rng):
    d = da.from_array(rng.standard_normal((6,)), chunks=3)
    with pytest.raises(IndexError, match="too many"):
        d.vindex[np.array([0, 1]), np.array([2, 3])]


def test_nanquantile_tuple_axis(rng):
    # round 3: tuple axes are supported (reference reductions/_common.py:977)
    x = rng.standard_normal((4, 4))
    d = da.from_array(x, chunks=2)
    np.testing.assert_allclose(
        np.asarray(da.nanquantile(d, 0.5, axis=(0, 1)).compute()),
        np.nanquantile(x, 0.5, axis=(0, 1)),
        rtol=1e-12,
    )


def test_bool_mask_wrong_shape_raises(rng):
    d = da.from_array(rng.standard_normal((4, 4)), chunks=2)
    with pytest.raises(IndexError, match="did not match"):
        d[np.ones((2, 8), dtype=bool)]


def test_take_large_index_is_ndarray_operand(rng):
    from dask_array_tpu.ops._fancy_indexing import Take

    d = da.from_array(rng.standard_normal((100,)), chunks=20)
    out = da.take(d, np.arange(50))
    take_nodes = [n for n in out.expr.walk() if isinstance(n, Take)]
    assert take_nodes and isinstance(take_nodes[0].indices, np.ndarray)
    assert_eq(out, np.asarray(d.compute())[:50])


# -- third review round fixes ---------------------------------------------------


def test_ufunc_reduce_out_declined(rng):
    d = da.from_array(rng.standard_normal((4,)), chunks=2)
    buf = np.zeros(())
    with pytest.raises(TypeError):
        np.add.reduce(d, out=buf)


def test_normalize_chunks_rejects_fractional():
    from dask_array_tpu._chunks import normalize_chunks

    with pytest.raises(ValueError, match="integers"):
        normalize_chunks(100.5, shape=(1000,))
    with pytest.raises(ValueError, match="integers"):
        normalize_chunks(((2.5, 2.5),), shape=(5,))
    assert normalize_chunks(100.0, shape=(1000,)) == ((100,) * 10,)


def test_cached_cumsum_is_cached():
    from dask_array_tpu._chunks import _cumsum_cached, cached_cumsum

    _cumsum_cached.cache_clear()
    cached_cumsum((5, 5, 5), initial_zero=True)
    cached_cumsum((5, 5, 5), initial_zero=True)
    info = _cumsum_cached.cache_info()
    assert info.hits >= 1


def test_executable_cache_keys_on_donation(rng):
    from dask_array_tpu import config
    from dask_array_tpu._executor import _program_key

    x = rng.standard_normal((8,))
    d = (da.from_array(x, chunks=4) * 2).optimize()
    from dask_array_tpu._executor import collect_leaves

    keys = tuple(k for k, _ in collect_leaves(d.expr))
    k1 = _program_key(d.expr, keys, None, True)
    k2 = _program_key(d.expr, keys, None, False)
    assert k1 != k2  # a donating executable must not serve non-donating calls


def test_eager_program_no_double_device_put(rng, monkeypatch):
    from dask_array_tpu import config as _cfg

    if not _cfg.get("tpu.jit", True):
        pytest.skip("eager lane: no trace attempt to memoize")
    import dask_array_tpu._executor as ex

    calls = []
    orig = ex._device_put_leaves

    def spy(pairs, mesh, donate=False):
        calls.append(1)
        return orig(pairs, mesh, donate)

    monkeypatch.setattr(ex, "_device_put_leaves", spy)
    x = rng.standard_normal((8,))
    d = da.from_array(x, chunks=4)
    y = d.map_blocks(lambda b: np.asarray(b) * 2, dtype=x.dtype)  # untraceable
    with pytest.warns(RuntimeWarning):
        np.testing.assert_allclose(np.asarray(y.compute()), x * 2)
    first = len(calls)
    # second run of the same structure: known-eager, ONE leaf pass only
    y2 = da.from_array(x + 1, chunks=4).map_blocks(lambda b: np.asarray(b) * 2, dtype=x.dtype)
    calls.clear()
    np.testing.assert_allclose(np.asarray(y2.compute()), (x + 1) * 2)
    assert len(calls) <= 1


def test_empty_slice_on_size1_broadcast_dim(rng):
    # review pass 4: slice_for_ndim used to map a zero-length slice on a
    # size-1 broadcast operand dim to slice(None), so (x + y)[:, 0:0]
    # produced shape (3, 1) instead of (3, 0)
    xs = rng.standard_normal((3, 1))
    ys = rng.standard_normal((3, 4))
    x = da.from_array(xs, chunks=(3, 1))
    y = da.from_array(ys, chunks=(3, 2))
    z = (x + y)[:, 0:0]
    assert z.shape == (3, 0)
    out = np.asarray(z.compute())
    np.testing.assert_allclose(out, (xs + ys)[:, 0:0])


def test_shuffle_on_all_broadcast_axis(rng):
    # review pass 4: Elemwise._accept_shuffle returned the unmodified
    # elemwise (dropping the shuffle) when every operand broadcast along
    # the shuffled axis; it must decline instead so Shuffle materializes
    xs = rng.standard_normal((3, 1))
    ys = rng.standard_normal((3, 1))
    x = da.from_array(xs, chunks=(3, 1))
    y = da.from_array(ys, chunks=(3, 1))
    z = da.shuffle(x + y, [[0], [0]], axis=1)
    assert z.shape == (3, 2)
    out = np.asarray(z.compute())
    expect = (xs + ys)[:, [0, 0]]
    np.testing.assert_allclose(out, expect)


# -- broadcast shape mismatch must raise (found by /verify round 2) ----------


def test_elemwise_mismatched_shapes_raise():
    a = da.ones((512, 512), chunks=128)
    b = da.ones((7, 7), chunks=7)
    with pytest.raises(ValueError, match="broadcast"):
        a + b
    with pytest.raises(ValueError, match="broadcast"):
        da.ones((4, 5), chunks=2) * da.ones((6,), chunks=3)


def test_elemwise_legitimate_broadcasts_still_work():
    assert (da.ones((5, 1), chunks=2) + da.ones((5, 7), chunks=3)).shape == (5, 7)
    assert (da.ones((4, 6), chunks=2) + da.ones((6,), chunks=3)).shape == (4, 6)
    out = (da.ones((3, 1), chunks=1) + da.ones((1, 4), chunks=2)).compute()
    np.testing.assert_array_equal(np.asarray(out), np.full((3, 4), 2.0))
