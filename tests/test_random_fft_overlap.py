import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu import fft as dafft
from dask_array_tpu import random as darandom
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.ops._gufunc import apply_gufunc, as_gufunc
from dask_array_tpu.ops._histogram import histogram, histogram2d, histogramdd
from dask_array_tpu.ops._overlap import map_overlap, overlap, push, sliding_window_view, trim_internal


# ---------------- random ----------------


def test_random_basic_stats():
    rng = darandom.default_rng(42)
    x = rng.normal(3.0, 2.0, size=(400, 400), chunks=100)
    assert x.shape == (400, 400)
    assert x.dtype == np.float64
    val = x.compute()
    assert abs(val.mean() - 3.0) < 0.05
    assert abs(val.std() - 2.0) < 0.05


def test_random_deterministic_and_chunk_independent():
    a = darandom.default_rng(7).random(size=(100,), chunks=25).compute()
    b = darandom.default_rng(7).random(size=(100,), chunks=25).compute()
    np.testing.assert_array_equal(a, b)
    # values depend only on (seed, shape), NOT the chunk grid (by design —
    # stronger than the reference's per-block streams)
    c = darandom.default_rng(7).random(size=(100,), chunks=50).compute()
    np.testing.assert_array_equal(a, c)
    # rechunk is absorbed into the random leaf
    x = darandom.default_rng(7).random(size=(100,), chunks=25)
    from dask_array_tpu.ops.random import Random

    opt = x.rechunk(50).expr.simplify().lower_completely()
    leaves = [n for n in opt.walk() if isinstance(n, Random)]
    assert leaves and leaves[0].chunks == ((50, 50),)
    # two draws from the same generator differ
    g = darandom.default_rng(1)
    d1 = g.random(size=10).compute()
    d2 = g.random(size=10).compute()
    assert not np.array_equal(d1, d2)


@pytest.mark.parametrize(
    "name,args,check",
    [
        ("uniform", dict(low=2, high=5), lambda v: (v >= 2).all() and (v < 5).all()),
        ("integers", dict(low=0, high=10), lambda v: ((v >= 0) & (v < 10)).all()),
        ("poisson", dict(lam=4.0), lambda v: abs(v.mean() - 4) < 0.3),
        ("exponential", dict(scale=2.0), lambda v: abs(v.mean() - 2) < 0.3),
        ("beta", dict(a=2.0, b=5.0), lambda v: abs(v.mean() - 2 / 7) < 0.05),
        ("gamma", dict(shape=3.0, scale=2.0), lambda v: abs(v.mean() - 6) < 0.5),
        ("binomial", dict(n=10, p=0.3), lambda v: abs(v.mean() - 3) < 0.3),
        ("standard_cauchy", dict(), lambda v: np.isfinite(v).all()),
        ("laplace", dict(loc=1.0, scale=1.0), lambda v: abs(v.mean() - 1) < 0.3),
        ("lognormal", dict(mean=0.0, sigma=0.5), lambda v: abs(np.log(v).mean()) < 0.1),
        ("geometric", dict(p=0.5), lambda v: abs(v.mean() - 2.0) < 0.3),
        ("standard_t", dict(df=10.0), lambda v: abs(v.mean()) < 0.2),
        ("chisquare", dict(df=4.0), lambda v: abs(v.mean() - 4) < 0.4),
        ("rayleigh", dict(scale=1.0), lambda v: abs(v.mean() - np.sqrt(np.pi / 2)) < 0.2),
        ("wald", dict(mean=2.0, scale=3.0), lambda v: abs(v.mean() - 2.0) < 0.4),
        ("pareto", dict(a=5.0), lambda v: abs(v.mean() - 0.25) < 0.2),
        ("weibull", dict(a=2.0), lambda v: abs(v.mean() - 0.886) < 0.2),
        ("negative_binomial", dict(n=5.0, p=0.5), lambda v: abs(v.mean() - 5) < 0.8),
        ("triangular", dict(left=0.0, mode=1.0, right=2.0), lambda v: abs(v.mean() - 1.0) < 0.2),
    ],
)
def test_distributions(name, args, check):
    g = darandom.default_rng(3)
    x = getattr(g, name)(size=(50, 50), chunks=25, **args)
    v = np.asarray(x.compute(), dtype="f8")
    assert v.shape == (50, 50)
    assert check(v), (name, v.mean())


def test_randomstate_and_module_fns():
    rs = darandom.RandomState(5)
    assert rs.rand(20, chunks=10).compute().shape == (20,)
    assert rs.randn(20, chunks=10).compute().shape == (20,)
    v = rs.randint(0, 5, size=30, chunks=10).compute()
    assert ((v >= 0) & (v < 5)).all()
    assert darandom.random(size=(5, 5)).compute().shape == (5, 5)
    perm = darandom.default_rng(0).permutation(10).compute()
    assert sorted(perm.tolist()) == list(range(10))


def test_choice():
    out = darandom.choice(10, size=50, rng=darandom.default_rng(0)).compute()
    assert ((out >= 0) & (out < 10)).all()
    a = da.arange(20, chunks=5) * 2
    picked = darandom.default_rng(1).choice(a, size=8).compute()
    assert all(p in list(range(0, 40, 2)) for p in picked)


# ---------------- fft ----------------


def test_fft_roundtrip(rng):
    x = rng.standard_normal((16, 32))
    d = da.from_array(x, chunks=(8, 32))
    assert_eq(dafft.fft(d), np.fft.fft(x))
    assert_eq(dafft.ifft(dafft.fft(d)), np.fft.ifft(np.fft.fft(x)))
    assert_eq(dafft.rfft(d), np.fft.rfft(x))
    assert_eq(dafft.irfft(dafft.rfft(d)), np.fft.irfft(np.fft.rfft(x)))
    assert_eq(dafft.hfft(d), np.fft.hfft(x))
    assert_eq(dafft.ihfft(d), np.fft.ihfft(x))


def test_fft2_fftn(rng):
    x = rng.standard_normal((16, 16))
    d = da.from_array(x, chunks=(16, 16))
    assert_eq(dafft.fft2(d), np.fft.fft2(x))
    assert_eq(dafft.fftn(d), np.fft.fftn(x))
    assert_eq(dafft.rfft2(d), np.fft.rfft2(x))


def test_fft_requires_single_chunk(rng):
    d = da.ones((16, 16), chunks=(8, 8))
    with pytest.raises(ValueError, match="single chunk"):
        dafft.fft(d)


def test_fftfreq_shift(rng):
    assert_eq(dafft.fftfreq(10, d=0.5, chunks=3), np.fft.fftfreq(10, d=0.5))
    assert_eq(dafft.rfftfreq(9, d=2.0, chunks=3), np.fft.rfftfreq(9, d=2.0))
    x = rng.standard_normal((8, 9))
    d = da.from_array(x, chunks=3)
    assert_eq(dafft.fftshift(d), np.fft.fftshift(x))
    assert_eq(dafft.ifftshift(dafft.fftshift(d)), x)


# ---------------- overlap ----------------


def test_overlap_chunks_and_values(rng):
    x = np.arange(64, dtype="f8").reshape(8, 8)
    d = da.from_array(x, chunks=4)
    g = overlap(d, depth=1, boundary="none")
    assert g.chunks == ((5, 5), (5, 5))
    # interior block gets halos from every side
    g_full = overlap(d, depth=1, boundary="reflect")
    assert g_full.chunks == ((6, 6), (6, 6))
    t = trim_internal(g_full, 1, "reflect")
    assert t.chunks == d.chunks
    assert_eq(t, x)


def test_map_overlap_stencil(rng):
    import jax.numpy as jnp

    x = rng.standard_normal((16, 16))
    d = da.from_array(x, chunks=8)

    def laplace(b):
        # size-preserving stencil on the halo'd block; garbage at the rim is
        # trimmed away with the halo
        return (
            jnp.roll(b, 1, 0) + jnp.roll(b, -1, 0) + jnp.roll(b, 1, 1) + jnp.roll(b, -1, 1)
            - 4 * b
        )

    out = map_overlap(laplace, d, depth=1, boundary="reflect", dtype=x.dtype)
    padded = np.pad(x, 1, mode="symmetric")  # dask reflect = edge-inclusive
    expected = (
        padded[:-2, 1:-1] + padded[2:, 1:-1] + padded[1:-1, :-2] + padded[1:-1, 2:] - 4 * x
    )
    assert_eq(out, expected)


def test_map_overlap_periodic(rng):
    x = rng.standard_normal((12,))
    d = da.from_array(x, chunks=4)
    out = map_overlap(lambda b: b * 1.0, d, depth=1, boundary="periodic", dtype=x.dtype)
    assert_eq(out, x)


def test_sliding_window_view(rng):
    x = rng.standard_normal((20,))
    d = da.from_array(x, chunks=6)
    w = sliding_window_view(d, 5)
    expected = np.lib.stride_tricks.sliding_window_view(x, 5)
    assert w.shape == expected.shape
    assert_eq(w, expected, check_chunks=False)
    x2 = rng.standard_normal((8, 9))
    w2 = sliding_window_view(da.from_array(x2, chunks=4), (3,), axis=(1,))
    assert_eq(w2, np.lib.stride_tricks.sliding_window_view(x2, (3,), axis=(1,)), check_chunks=False)


def test_push(rng):
    x = np.array([1.0, np.nan, np.nan, 4.0, np.nan, 6.0])
    d = da.from_array(x, chunks=2)
    out = push(d, axis=0).compute()
    np.testing.assert_array_equal(out, [1.0, 1.0, 1.0, 4.0, 4.0, 6.0])
    out_lim = push(d, n=1, axis=0).compute()
    np.testing.assert_array_equal(out_lim, [1.0, 1.0, np.nan, 4.0, 4.0, 6.0])
    # leading NaNs stay
    y = np.array([np.nan, np.nan, 3.0])
    np.testing.assert_array_equal(push(da.from_array(y, chunks=2)).compute(), [np.nan, np.nan, 3.0])


# ---------------- gufunc ----------------


def test_apply_gufunc_core_reduction(rng):
    import jax.numpy as jnp

    x = rng.standard_normal((12, 8))
    d = da.from_array(x, chunks=(3, 8))

    def inner(a, b):
        return jnp.sum(a * b, axis=-1)

    out = apply_gufunc(inner, "(i),(i)->()", d, d, output_dtypes=x.dtype)
    assert_eq(out, np.sum(x * x, axis=-1), rtol=1e-10)


def test_apply_gufunc_rechunks_core(rng):
    import jax.numpy as jnp

    x = rng.standard_normal((6, 10))
    d = da.from_array(x, chunks=(3, 5))
    out = apply_gufunc(
        lambda a: jnp.mean(a, axis=-1), "(i)->()", d, output_dtypes=x.dtype, allow_rechunk=True
    )
    assert_eq(out, x.mean(axis=-1))
    with pytest.raises(ValueError, match="chunked"):
        apply_gufunc(lambda a: jnp.mean(a, axis=-1), "(i)->()", d, output_dtypes=x.dtype)


def test_as_gufunc_multi_output(rng):
    import jax.numpy as jnp

    x = rng.standard_normal((10, 6))
    d = da.from_array(x, chunks=(5, 6))

    @as_gufunc("(i)->(),()", output_dtypes=(x.dtype, x.dtype), allow_rechunk=True)
    def stats(row):
        return jnp.mean(row, axis=-1), jnp.std(row, axis=-1)

    mu, sd = stats(d)
    assert_eq(mu, x.mean(axis=1))
    assert_eq(sd, x.std(axis=1), rtol=1e-6)


def test_apply_gufunc_vectorize(rng):
    x = rng.standard_normal((4, 5))
    d = da.from_array(x, chunks=(2, 5))

    def scalar_fn(row):
        import jax.numpy as jnp

        return jnp.dot(row, row)

    out = apply_gufunc(scalar_fn, "(i)->()", d, output_dtypes=x.dtype, vectorize=True)
    assert_eq(out, (x * x).sum(axis=1), rtol=1e-10)


# ---------------- histogram ----------------


def test_histogram(rng):
    x = rng.standard_normal(1000)
    d = da.from_array(x, chunks=100)
    h, edges = histogram(d, bins=20, range=(-3, 3))
    hn, en = np.histogram(x, bins=20, range=(-3, 3))
    assert_eq(h, hn)
    assert_eq(edges, en)
    # explicit bin edges + weights + density
    be = np.linspace(-2, 2, 11)
    w = rng.random(1000)
    h2, _ = histogram(d, bins=be, weights=da.from_array(w, chunks=100))
    hn2, _ = np.histogram(x, bins=be, weights=w)
    assert_eq(h2, hn2, rtol=1e-8)
    h3, _ = histogram(d, bins=be, density=True)
    hn3, _ = np.histogram(x, bins=be, density=True)
    assert_eq(h3, hn3, rtol=1e-8)


def test_histogram2d_dd(rng):
    x = rng.standard_normal(500)
    y = rng.standard_normal(500)
    dx, dy = da.from_array(x, chunks=100), da.from_array(y, chunks=100)
    h, ex, ey = histogram2d(dx, dy, bins=8, range=((-2, 2), (-2, 2)))
    hn, exn, eyn = np.histogram2d(x, y, bins=8, range=((-2, 2), (-2, 2)))
    assert_eq(h, hn, check_dtype=False)
    assert_eq(ex, exn)
    hdd, edges = histogramdd((dx, dy), bins=(4, 5), range=((-2, 2), (-2, 2)))
    hddn, _ = np.histogramdd((x, y), bins=(4, 5), range=((-2, 2), (-2, 2)))
    assert_eq(hdd, hddn, check_dtype=False)


# ---------------- linalg decompositions ----------------


def test_tsqr(rng):
    x = rng.standard_normal((200, 16))
    d = da.from_array(x, chunks=(50, 16))
    from dask_array_tpu.ops.linalg_decomp import tsqr

    q, r = tsqr(d)
    qc, rc = q.compute(), r.compute()
    np.testing.assert_allclose(qc @ rc, x, atol=1e-8)
    np.testing.assert_allclose(qc.T @ qc, np.eye(16), atol=1e-8)
    assert np.all(np.diag(rc) >= 0)


def test_qr_svd(rng):
    from dask_array_tpu.ops.linalg_decomp import qr, svd, svd_compressed

    x = rng.standard_normal((120, 10))
    d = da.from_array(x, chunks=(30, 10))
    q, r = qr(d)
    np.testing.assert_allclose(q.compute() @ r.compute(), x, atol=1e-8)
    u, s, vh = svd(d)
    np.testing.assert_allclose(
        (u.compute() * s.compute()) @ vh.compute(), x, atol=1e-8
    )
    np.testing.assert_allclose(np.sort(s.compute()), np.sort(np.linalg.svd(x)[1]), atol=1e-8)
    # compressed svd approximates the top singular values
    u2, s2, v2 = svd_compressed(d, k=5, seed=0, n_power_iter=2)
    np.testing.assert_allclose(s2.compute()[:3], np.linalg.svd(x)[1][:3], rtol=0.05)


def test_cholesky_solve_inv(rng):
    from dask_array_tpu.ops.linalg_decomp import cholesky, inv, lstsq, lu, solve, solve_triangular

    a = rng.standard_normal((12, 12))
    spd = a @ a.T + 12 * np.eye(12)
    d = da.from_array(spd, chunks=12)
    c = cholesky(d, lower=True)
    np.testing.assert_allclose(c.compute(), np.linalg.cholesky(spd), atol=1e-8)
    b = rng.standard_normal((12, 3))
    db = da.from_array(b, chunks=12)
    np.testing.assert_allclose(solve(d, db).compute(), np.linalg.solve(spd, b), atol=1e-7)
    np.testing.assert_allclose(inv(d).compute(), np.linalg.inv(spd), atol=1e-7)
    p, l, u = lu(da.from_array(a, chunks=12))
    np.testing.assert_allclose(p.compute() @ l.compute() @ u.compute(), a, atol=1e-8)
    tri = np.tril(a) + 12 * np.eye(12)
    np.testing.assert_allclose(
        solve_triangular(da.from_array(tri, chunks=12), db, lower=True).compute(),
        np.linalg.solve(tri, b),
        atol=1e-7,
    )
    x_l, res, rank, sv = lstsq(da.from_array(a[:, :4], chunks=12), db)
    np.testing.assert_allclose(x_l.compute(), np.linalg.lstsq(a[:, :4], b, rcond=None)[0], atol=1e-7)


def test_norm(rng):
    from dask_array_tpu.ops.linalg_decomp import norm

    x = rng.standard_normal((8, 6))
    d = da.from_array(x, chunks=3)
    assert_eq(norm(d), np.linalg.norm(x))
    assert_eq(norm(d, "fro"), np.linalg.norm(x, "fro"))
    assert_eq(norm(d, 1), np.linalg.norm(x, 1))
    assert_eq(norm(d, np.inf), np.linalg.norm(x, np.inf))
    v = rng.standard_normal(9)
    dv = da.from_array(v, chunks=3)
    assert_eq(norm(dv), np.linalg.norm(v))
    assert_eq(norm(dv, 1), np.linalg.norm(v, 1))
    assert_eq(norm(dv, np.inf), np.linalg.norm(v, np.inf))


def test_apply_gufunc_axes_keepdims(rng):
    import jax.numpy as jnp

    x = rng.standard_normal((6, 20))
    d = da.from_array(x, chunks=(3, 20))
    # reduce along axis 0 instead of the trailing axis
    out = apply_gufunc(
        lambda a: jnp.sum(a, axis=-1), "(i)->()", d, output_dtypes=x.dtype,
        axis=0, allow_rechunk=True,
    )
    assert_eq(out, x.sum(axis=0))
    outk = apply_gufunc(
        lambda a: jnp.sum(a, axis=-1), "(i)->()", d, output_dtypes=x.dtype,
        axis=0, keepdims=True, allow_rechunk=True,
    )
    assert_eq(outk, x.sum(axis=0, keepdims=True))
    # axes= with an output core dim placed at a non-trailing position
    y = rng.standard_normal((5, 7))
    dy = da.from_array(y, chunks=(5, 7))
    out2 = apply_gufunc(
        lambda a: a * 2, "(i)->(i)", dy, output_dtypes=y.dtype,
        axes=[(0,), (0,)], allow_rechunk=True,
    )
    assert_eq(out2, y * 2)


def test_fourth_review_fixes(rng):
    from dask_array_tpu.ops.linalg_decomp import norm
    from dask_array_tpu.ops.creation import indices as da_indices

    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=3)
    # norm with negative matrix axes + keepdims
    assert_eq(norm(d, 1, axis=(-2, -1)), np.linalg.norm(x, 1, axis=(-2, -1)))
    assert_eq(
        norm(d, np.inf, axis=(0, 1), keepdims=True),
        np.linalg.norm(x, np.inf, axis=(0, 1), keepdims=True),
    )
    assert_eq(
        norm(d, "fro", axis=(0, 1), keepdims=True),
        np.linalg.norm(x, "fro", axis=(0, 1), keepdims=True),
    )
    # fftn with s but no axes transforms the LAST len(s) axes
    xs = rng.standard_normal((4, 8))
    ds = da.from_array(xs, chunks=(4, 8))
    assert_eq(dafft.fftn(ds, s=(4,)), np.fft.fftn(xs, s=(4,)))
    # einsum forwards kwargs (optimize accepted by jnp)
    from dask_array_tpu.ops.linalg import einsum as da_einsum

    y = rng.standard_normal((8, 5))
    out = da_einsum("ij,jk->ik", d, da.from_array(y, chunks=4), precision="highest")
    assert_eq(out, np.einsum("ij,jk->ik", x, y), rtol=1e-10)
    # indices with per-axis chunk sizes
    idx = da_indices((4, 6), chunks=(2, 3))
    assert_eq(idx, np.indices((4, 6)), check_dtype=False)


def test_svd_compressed_low_rank_and_illconditioned_tsqr(rng):
    """Regression: CholeskyQR NaN'd when cond(panel)^2 > 1/eps_f32 (the
    svd_compressed compression panel); the eigh-clamped Gram fixes it."""
    u0 = rng.standard_normal((512, 6)).astype("f4")
    v0 = rng.standard_normal((6, 128)).astype("f4")
    a = (u0 * np.array([100, 50, 20, 10, 5, 2], "f4")) @ v0
    a = a + 0.01 * rng.standard_normal((512, 128)).astype("f4")
    d = da.from_array(a, chunks=(128, 64))
    # iterator="QR" re-orthonormalizes each power step: the tail singular
    # values survive f32 even at cond ratios past 1/eps_f32 (plain "power"
    # parity semantics washes them out, exactly as in the reference)
    uu, sv, vh = da.svd_compressed(d, k=6, seed=0, n_power_iter=2, iterator="QR")
    svc = sv.compute()
    ref = np.linalg.svd(a, compute_uv=False)[:6]
    np.testing.assert_allclose(svc, ref, rtol=0.01)
    # the "power" branch keeps the DOMINANT spectrum and never NaNs (the
    # per-step max-abs rescale prevents the f32 Gram overflow)
    _, sv2, _ = da.svd_compressed(d, k=6, seed=0, n_power_iter=2)
    svc2 = np.asarray(sv2.compute())
    assert np.isfinite(svc2).all()
    np.testing.assert_allclose(svc2[:4], ref[:4], rtol=0.01)
    # ill-conditioned tall-skinny input stays finite + orthonormal
    b = np.hstack([u0, u0 * 1e-5 + 1e-6 * rng.standard_normal((512, 6)).astype("f4")])
    q, r = da.linalg.tsqr(da.from_array(b, chunks=(128, 12)))
    qc = q.compute()
    assert np.isfinite(qc).all()
    np.testing.assert_allclose(qc.T @ qc, np.eye(12), atol=5e-5)
    np.testing.assert_allclose(qc @ r.compute(), b, atol=2e-4 * np.abs(b).max())


def test_vonmises_statistics(rng):
    # Best-Fisher sampler: circular mean ~ mu, mean resultant length
    # ~ I1(kappa)/I0(kappa)
    mu, kappa = 0.7, 3.0
    r = da.random.default_rng(5)
    s = np.asarray(r.vonmises(mu, kappa, size=(20000,), chunks=5000).compute())
    assert s.min() >= -np.pi - 1e-6 and s.max() <= np.pi + 1e-6
    circ_mean = np.angle(np.exp(1j * s).mean())
    assert abs(circ_mean - mu) < 0.05
    resultant = np.abs(np.exp(1j * s).mean())
    expected_r = np.i0(kappa) and (lambda: __import__("scipy.special", fromlist=["iv"]))
    from numpy import i0
    # I1/I0 via numpy's i0 and a finite difference-free identity is awkward;
    # compare against numpy's own sampler instead
    ns = np.random.default_rng(5).vonmises(mu, kappa, size=200000)
    np.testing.assert_allclose(resultant, np.abs(np.exp(1j * ns).mean()), atol=0.02)


def test_vonmises_kappa_zero_uniform():
    r = da.random.default_rng(2)
    s = np.asarray(r.vonmises(0.0, 1e-9, size=(20000,), chunks=10000).compute())
    # uniform on the circle: resultant length ~ 0
    assert np.abs(np.exp(1j * s).mean()) < 0.03


def test_pad_callable_mode(rng):
    x = rng.standard_normal((8, 6))
    d = da.from_array(x, chunks=(4, 3))

    def fill_mean(vector, pad_width, iaxis, kwargs):
        vector[:pad_width[0]] = vector[pad_width[0]:pad_width[0] + 1].mean() if pad_width[0] else 0
        if pad_width[1]:
            vector[-pad_width[1]:] = 9.0
        return vector

    got = da.pad(d, ((1, 2), (0, 0)), mode=fill_mean)
    want = np.pad(x, ((1, 2), (0, 0)), fill_mean)
    assert_eq(got, want)


def test_searchsorted_sorter(rng):
    a = rng.standard_normal((30,))
    sorter = np.argsort(a)
    v = rng.standard_normal((12,))
    da_a = da.from_array(a, chunks=10)
    da_v = da.from_array(v, chunks=4)
    got = da.searchsorted(da_a, da_v, sorter=sorter)
    assert_eq(got, np.searchsorted(a, v, sorter=sorter))


def test_frompyfunc_multi_output(rng):
    f = da.frompyfunc(lambda a: (a + 1.0, a * 2.0), 1, 2)
    x = rng.standard_normal((9,))
    o1, o2 = f(da.from_array(x, chunks=3))
    np.testing.assert_allclose(np.asarray(o1.compute()), x + 1.0)
    np.testing.assert_allclose(np.asarray(o2.compute()), x * 2.0)


def test_vonmises_tiny_kappa_terminates_in_f32():
    # regression: rho = (tau - sqrt(2 tau))/(2 k) cancels to 0 in f32 for
    # small kappa -> r = inf -> NaN acceptance -> the Best-Fisher rejection
    # loop never terminated (caught by the eager lane). The conjugate-form
    # rho is exact; the loop is also iteration-bounded as insurance.
    import jax.numpy as jnp

    from dask_array_tpu.ops import random as R

    r = da.random.default_rng(11)
    for kappa in (1e-9, 1e-7, 1e-5):
        s = np.asarray(r.vonmises(0.0, kappa, size=(2000,), chunks=1000).compute())
        assert np.all(np.isfinite(s))
        assert np.all((s >= -np.pi) & (s <= np.pi))


def test_round3_distributions_moments():
    # hypergeometric/logseries/multinomial/noncentral_chisquare/noncentral_f/
    # zipf: traced kernels (urn fori_loop, rejection while_loops, binomial
    # chain, Poisson mixture) whose moments must match numpy's samplers
    N = 40_000
    g = da.random.default_rng(7)
    ng = np.random.default_rng(7)

    h = np.asarray(g.hypergeometric(30, 20, 15, size=N).compute())
    hn = ng.hypergeometric(30, 20, 15, size=N)
    assert abs(h.mean() - hn.mean()) < 0.1 and abs(h.var() - hn.var()) < 0.2

    ls = np.asarray(g.logseries(0.6, size=N).compute())
    lsn = ng.logseries(0.6, size=N)
    assert abs(ls.mean() - lsn.mean()) < 0.05 and ls.min() >= 1

    m = np.asarray(g.multinomial(50, [0.2, 0.3, 0.5], size=N).compute())
    assert m.shape == (N, 3)
    np.testing.assert_array_equal(np.unique(m.sum(axis=1)), [50])
    np.testing.assert_allclose(m.mean(axis=0), [10, 15, 25], rtol=0.03)

    nc = np.asarray(g.noncentral_chisquare(3.0, 2.5, size=N).compute())
    assert abs(nc.mean() - 5.5) < 0.15  # E = df + nonc
    assert abs(nc.var() - (2 * 3 + 4 * 2.5)) < 0.7  # Var = 2 df + 4 nonc

    nf = np.asarray(g.noncentral_f(5.0, 20.0, 3.0, size=N).compute())
    exp_mean = (20.0 * (5.0 + 3.0)) / (5.0 * (20.0 - 2.0))  # dfden(dfnum+nonc)/(dfnum(dfden-2))
    assert abs(nf.mean() - exp_mean) < 0.05

    z = np.asarray(g.zipf(3.0, size=N).compute())
    zn = ng.zipf(3.0, size=N)
    assert z.min() >= 1
    assert abs((z == 1).mean() - (zn == 1).mean()) < 0.02
    assert abs(z.mean() - zn.mean()) < 0.05


def test_round3_distribution_validation():
    g = da.random.default_rng(0)
    with pytest.raises(ValueError):
        g.zipf(1.0)
    with pytest.raises(ValueError):
        g.logseries(1.5)
    with pytest.raises(ValueError):
        g.noncentral_chisquare(-1.0, 1.0)
    with pytest.raises(ValueError):
        g.multinomial(5, [0.9, 0.2, 0.2])  # sum(pvals[:-1]) > 1, numpy's check


def test_module_seed_and_random_integers():
    da.random.seed(5)
    a1 = np.asarray(da.random.random(4).compute())
    da.random.seed(5)
    a2 = np.asarray(da.random.random(4).compute())
    np.testing.assert_array_equal(a1, a2)
    ri = np.asarray(da.random.random_integers(1, 3, size=2000).compute())
    assert sorted(np.unique(ri).tolist()) == [1, 2, 3]
    assert hasattr(da.random, "vonmises") and hasattr(da.random, "zipf")


def test_compression_matrix_public():
    # parity: reference linalg exports compression_level/compression_matrix
    assert da.linalg.compression_level(100, 5) == 20  # min_subspace floor
    assert da.linalg.compression_level(100, 50) == 60
    assert da.linalg.compression_level(10, 50) == 10  # capped by the space
    rng = np.random.default_rng(0)
    x = rng.standard_normal((128, 32))
    cm = da.linalg.compression_matrix(da.from_array(x, chunks=(32, 16)), 10, seed=1)
    q = np.asarray(cm.compute())
    assert q.shape == (20, 128)
    np.testing.assert_allclose(q @ q.T, np.eye(20), atol=1e-8)


def test_multivariate_hypergeometric():
    N = 20_000
    g = da.random.default_rng(11)
    ng = np.random.default_rng(11)
    m = np.asarray(g.multivariate_hypergeometric([16, 8, 4], 6, size=N).compute())
    mn = ng.multivariate_hypergeometric([16, 8, 4], 6, size=N)
    assert m.shape == (N, 3)
    np.testing.assert_array_equal(np.unique(m.sum(axis=1)), [6])
    np.testing.assert_allclose(m.mean(axis=0), mn.mean(axis=0), atol=0.06)
    np.testing.assert_allclose(m.var(axis=0), mn.var(axis=0), atol=0.08)
    with pytest.raises(ValueError):
        g.multivariate_hypergeometric([3, 2], 10)  # nsample > sum(colors)
    with pytest.raises(ValueError):
        g.multivariate_hypergeometric([3, 2], 2, method="bogus")


def test_hypergeometric_complement_path():
    # nsample > total/2 samples the complement (O(min(nsample, total-nsample)))
    N = 20_000
    g = da.random.default_rng(7)
    ng = np.random.default_rng(7)
    h = np.asarray(g.hypergeometric(30, 20, 40, size=N).compute())
    hn = ng.hypergeometric(30, 20, 40, size=N)
    assert h.min() >= 20 and h.max() <= 30
    assert abs(h.mean() - hn.mean()) < 0.1 and abs(h.var() - hn.var()) < 0.15
    full = np.asarray(g.hypergeometric(5, 3, 8, size=50).compute())
    np.testing.assert_array_equal(np.unique(full), [5])
    with pytest.raises(ValueError):
        g.hypergeometric(3, 2, 9)
