"""Complex-dtype battery.

Regression sources: complex ``var``/``std``/``nanvar`` must compute
``E|x - mu|^2`` (a REAL number — numpy semantics), and every Gram-based
factorization (TSQR passes, eigh-SVD) must use the HERMITIAN Gram
``A^H A`` (plain ``A^T A`` silently produced wrong complex factors).
"""

from __future__ import annotations

import numpy as np
import pytest

import dask_array_tpu as da


@pytest.fixture
def z(rng=None):
    r = np.random.default_rng(13)
    return r.standard_normal((6, 8)) + 1j * r.standard_normal((6, 8))


def eq(a, b, **kw):
    got = np.asarray(a.compute())
    want = np.asarray(b)
    assert got.dtype == want.dtype, (got.dtype, want.dtype)
    np.testing.assert_allclose(got, want, **kw)


def test_complex_elementwise_and_reductions(z):
    d = da.from_array(z, chunks=(3, 4))
    eq(d.sum(axis=0), z.sum(axis=0), rtol=1e-10)
    eq(d.conj(), z.conj())
    eq(abs(d), abs(z), rtol=1e-10)
    eq(da.angle(d), np.angle(z), rtol=1e-10)
    eq(d.cumsum(axis=0), z.cumsum(axis=0), rtol=1e-10)


def test_complex_var_std_is_real(z):
    d = da.from_array(z, chunks=(3, 4))
    eq(d.var(axis=1), z.var(axis=1), rtol=1e-10)
    eq(d.std(), z.std(), rtol=1e-10)
    zn = z.copy()
    zn[0, 0] = np.nan
    dn = da.from_array(zn, chunks=(3, 4))
    eq(da.nanvar(dn, axis=0), np.nanvar(zn, axis=0), rtol=1e-9)


def test_complex_matmul_hermitian(z):
    d = da.from_array(z, chunks=(3, 4))
    eq(d @ d.conj().T, z @ z.conj().T, rtol=1e-10)


def test_complex_svd(z):
    u, s, vh = da.linalg.svd(da.from_array(z, chunks=(6, 8)))
    rec = np.asarray((u * s @ vh).compute())
    np.testing.assert_allclose(rec, z, atol=1e-8)
    uu = np.asarray(u.compute())
    np.testing.assert_allclose(uu.conj().T @ uu, np.eye(6), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(s.compute()), np.linalg.svd(z, compute_uv=False), atol=1e-8
    )


def test_complex_tsqr():
    r = np.random.default_rng(14)
    tz = r.standard_normal((40, 5)) + 1j * r.standard_normal((40, 5))
    q, rr = da.linalg.qr(da.from_array(tz, chunks=(10, 5)))
    qc = np.asarray(q.compute())
    np.testing.assert_allclose(qc.conj().T @ qc, np.eye(5), atol=1e-8)
    np.testing.assert_allclose(qc @ np.asarray(rr.compute()), tz, atol=1e-8)


def test_complex_solve(z):
    r = np.random.default_rng(15)
    a = z[:6, :6] + 6 * np.eye(6)
    b = r.standard_normal(6)
    out = da.linalg.solve(da.from_array(a, chunks=3), da.from_array(b, chunks=3))
    np.testing.assert_allclose(np.asarray(out.compute()), np.linalg.solve(a, b), atol=1e-8)


def test_complex_fft_roundtrip(z):
    d = da.from_array(z, chunks=(3, 8))
    eq(da.fft.ifft(da.fft.fft(d, axis=1), axis=1), z.astype("c16"), atol=1e-10)


def test_complex_where_isclose(z):
    d = da.from_array(z, chunks=(3, 4))
    eq(da.where(abs(d) > 1, d, 0), np.where(abs(z) > 1, z, 0))
    eq(da.isclose(d, d + 1e-12), np.isclose(z, z + 1e-12))
