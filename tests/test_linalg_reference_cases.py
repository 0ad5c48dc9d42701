"""Linalg edge cases ported from the reference's test_linalg.py.

Case sources (reference tests/test_linalg.py): tsqr_zero_height_chunks,
sfqr, solve(assume_a), lstsq, norm 'nuc'/-2, svd wide shapes,
cholesky(lower), lu rectangular error, tensordot double contraction,
vdot complex.
"""

from __future__ import annotations

import numpy as np
import pytest

import dask_array_tpu as da


@pytest.fixture
def rng():
    return np.random.default_rng(23)


def test_tsqr_zero_height_chunks(rng):
    x = rng.standard_normal((10, 4))
    d = da.from_array(x, chunks=((3, 0, 4, 3), (4,)))
    q, r = da.linalg.qr(d)
    np.testing.assert_allclose(np.asarray((q @ r).compute()), x, atol=1e-8)


def test_sfqr(rng):
    x = rng.standard_normal((4, 20))
    d = da.from_array(x, chunks=(4, 5))
    q, r = da.linalg.sfqr(d)
    np.testing.assert_allclose(np.asarray((q @ r).compute()), x, atol=1e-8)


def test_solve_assume_a_pos(rng):
    a = rng.standard_normal((8, 8))
    a = a @ a.T + 8 * np.eye(8)
    b = rng.standard_normal((8, 3))
    out = da.linalg.solve(da.from_array(a, chunks=4), da.from_array(b, chunks=4), assume_a="pos")
    np.testing.assert_allclose(np.asarray(out.compute()), np.linalg.solve(a, b), atol=1e-7)


def test_lstsq(rng):
    A = rng.standard_normal((20, 5))
    b = rng.standard_normal(20)
    x, res, rank, s = da.linalg.lstsq(da.from_array(A, chunks=5), da.from_array(b, chunks=5))
    nx, nres, nrank, ns = np.linalg.lstsq(A, b, rcond=None)
    np.testing.assert_allclose(np.asarray(x.compute()), nx, atol=1e-8)
    np.testing.assert_allclose(np.asarray(s.compute()), ns, atol=1e-8)


@pytest.mark.parametrize("ord_", ["nuc", -2, 2])
def test_norm_spectral_orders(rng, ord_):
    x = rng.standard_normal((6, 6))
    d = da.from_array(x, chunks=3)
    np.testing.assert_allclose(
        float(da.linalg.norm(d, ord_).compute()), np.linalg.norm(x, ord_), rtol=1e-7
    )


def test_svd_wide(rng):
    x = rng.standard_normal((5, 100))
    d = da.from_array(x, chunks=(5, 20))
    u, s, v = da.linalg.svd(d)
    np.testing.assert_allclose(np.asarray((u * s @ v).compute()), x, atol=1e-7)


def test_cholesky_lower(rng):
    a = rng.standard_normal((8, 8))
    a = a @ a.T + 8 * np.eye(8)
    d = da.from_array(a, chunks=4)
    L = da.linalg.cholesky(d, lower=True)
    np.testing.assert_allclose(np.asarray((L @ L.T).compute()), a, atol=1e-7)


def test_lu_rectangular_raises(rng):
    d = da.from_array(rng.standard_normal((6, 4)), chunks=2)
    with pytest.raises((ValueError, NotImplementedError)):
        da.linalg.lu(d)


def test_tensordot_double_contraction(rng):
    a = rng.standard_normal((3, 4, 5))
    b = rng.standard_normal((5, 4, 2))
    out = da.tensordot(da.from_array(a, chunks=2), da.from_array(b, chunks=2), axes=([2, 1], [0, 1]))
    np.testing.assert_allclose(
        np.asarray(out.compute()), np.tensordot(a, b, axes=([2, 1], [0, 1])), atol=1e-8
    )


def test_vdot_complex(rng):
    a = rng.standard_normal(8) + 1j * rng.standard_normal(8)
    b = rng.standard_normal(8) + 1j * rng.standard_normal(8)
    np.testing.assert_allclose(
        complex(da.vdot(da.from_array(a, chunks=3), da.from_array(b, chunks=3)).compute()),
        np.vdot(a, b),
        rtol=1e-10,
    )


def test_svd_compute_uv_false_returns_singular_values():
    rng = np.random.default_rng(3)
    a = rng.random((20, 10))
    d = da.from_array(a, chunks=(5, 10))
    s = da.linalg.svd(d, compute_uv=False)
    np.testing.assert_allclose(
        np.asarray(s.compute()), np.linalg.svd(a, compute_uv=False), rtol=1e-9
    )
    # full_matrices is irrelevant without uv (reference parity)
    s2 = da.linalg.svd(d, full_matrices=True, compute_uv=False)
    np.testing.assert_allclose(
        np.asarray(s2.compute()), np.linalg.svd(a, compute_uv=False), rtol=1e-9
    )


def test_svd_full_matrices_not_supported():
    d = da.ones((20, 10), chunks=(5, 10))
    with pytest.raises(NotImplementedError):
        da.linalg.svd(d, full_matrices=True)


def test_cov_explicit_dtype():
    rng = np.random.default_rng(4)
    x = rng.random((4, 12))
    c = da.cov(da.from_array(x, chunks=(2, 5)), dtype=np.float32)
    assert c.dtype == np.float32
    np.testing.assert_allclose(np.asarray(c.compute()), np.cov(x, dtype=np.float32), rtol=1e-5)
