"""TPU-safe (bitcast-free) formulations of the bit-twiddling ufuncs.

On TPU under jax_enable_x64, the jnp natives for signbit/copysign/ldexp/
frexp/nextafter/spacing fail to COMPILE on f64 (XLA's x64-rewrite pass has
no rule for 64-bit bitcast-convert).  ``ops/_bitsafe.py`` carries
arithmetic formulations; these tests force the safe path on CPU and check
it against numpy, so the math is validated independent of the platform
switch.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu.ops import _bitsafe


@pytest.fixture()
def force_safe(monkeypatch):
    monkeypatch.setattr(_bitsafe, "_use_safe", lambda *a: True)


def _vals():
    return np.array(
        [0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 2.0, -2.0, 1.5, -1.5,
         3.7, -3.7, 1e300, -1e300, 1e-300, -1e-300, np.inf, -np.inf, np.nan,
         123.456, -0.001, 4.0, 8.0, 0.25]
    )


def test_signbit_arith_matches_numpy(force_safe):
    v = _vals()
    got = np.asarray(_bitsafe.signbit(v))
    exp = np.signbit(v)
    # NaN sign is unspecified in the arithmetic formulation; skip it
    ok = ~np.isnan(v)
    np.testing.assert_array_equal(got[ok], exp[ok])


def test_copysign_arith_matches_numpy(force_safe):
    x = _vals()
    for y in (np.float64(3.0), np.float64(-3.0), np.float64(-0.0), -x):
        got = np.asarray(_bitsafe.copysign(x, y))
        exp = np.copysign(x, y)
        ok = ~np.isnan(np.broadcast_to(y, x.shape))
        np.testing.assert_array_equal(got[ok], exp[ok])


def test_ldexp_arith_matches_numpy(force_safe):
    x = np.array([1.0, -1.5, 0.75, 3.141592653589793, 0.0, -0.0, np.inf])
    for n in (-1000, -600, -53, -1, 0, 1, 53, 600, 1000):
        got = np.asarray(_bitsafe.ldexp(x, np.int64(n)))
        exp = np.ldexp(x, n)
        np.testing.assert_array_equal(got, exp)


def test_ldexp_arith_vector_exponent(force_safe):
    x = np.linspace(-2.0, 2.0, 9)
    n = np.arange(-4, 5)
    np.testing.assert_array_equal(
        np.asarray(_bitsafe.ldexp(x, n)), np.ldexp(x, n)
    )


def test_frexp_arith_matches_numpy(force_safe):
    v = _vals()
    m_got = np.asarray(_bitsafe.frexp_mantissa(v))
    e_got = np.asarray(_bitsafe.frexp_exponent(v))
    m_exp, e_exp = np.frexp(v)
    ok = np.isfinite(v)
    np.testing.assert_array_equal(m_got[ok], m_exp[ok])
    np.testing.assert_array_equal(e_got[ok], e_exp[ok])
    # frexp(x) reconstructs: m * 2**e == x (finite values)
    recon = np.ldexp(m_got[ok], e_got[ok])
    np.testing.assert_array_equal(recon, v[ok])
    # non-finite: mantissa passes through
    bad = ~np.isfinite(v)
    np.testing.assert_array_equal(m_got[bad], v[bad])


def test_nextafter_f32_granularity(force_safe):
    # the safe path computes at f32 granularity (the platform demotes f64)
    # no denormal cases: XLA flushes f32 subnormals to zero on upcast
    x = np.array([1.0, -1.0, 1e-30, 2.5])
    got = np.asarray(_bitsafe.nextafter(x, np.float64(np.inf)))
    exp = np.nextafter(x.astype(np.float32), np.float32(np.inf)).astype(np.float64)
    np.testing.assert_array_equal(got, exp)
    assert np.all(got > x)


def test_lazy_array_path_roundtrip(rng):
    # through the full lazy pipeline (native path on CPU; platform switch
    # is covered by the forced tests above and by the chip verify)
    xs = rng.standard_normal((4, 6))
    x = da.from_array(xs, chunks=(2, 3))
    np.testing.assert_array_equal(
        np.asarray(da.copysign(x, -x).compute()), np.copysign(xs, -xs)
    )
    np.testing.assert_array_equal(
        np.asarray(da.signbit(-x).compute()), np.signbit(-xs)
    )
    m, e = da.frexp(x)
    m_exp, e_exp = np.frexp(xs)
    np.testing.assert_array_equal(np.asarray(m.compute()), m_exp)
    np.testing.assert_array_equal(np.asarray(e.compute()), e_exp)
    n = da.from_array(np.arange(24).reshape(4, 6) - 12, chunks=(2, 3))
    np.testing.assert_array_equal(
        np.asarray(da.ldexp(x, n).compute()), np.ldexp(xs, np.arange(24).reshape(4, 6) - 12)
    )
    np.testing.assert_array_equal(
        np.asarray(da.nextafter(x, x + 1).compute()), np.nextafter(xs, xs + 1)
    )
