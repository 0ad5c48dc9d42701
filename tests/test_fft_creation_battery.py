"""FFT family + creation-function batteries vs numpy.

Ports the reference's fft test spine (``fft.py`` family: every generated
transform, axes/norm variants, freq/shift helpers) and the creation grid
(arange/linspace/eye/diag/tri/meshgrid/indices/fromfunction/pad modes/
tile/repeat).
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


@pytest.fixture
def rng():
    return np.random.default_rng(79)


# -- fft ----------------------------------------------------------------------


@pytest.mark.parametrize("name", ["fft", "ifft"])
@pytest.mark.parametrize("norm", [None, "ortho"])
def test_fft_1d(rng, name, norm):
    x = rng.standard_normal((8, 32)) + 1j * rng.standard_normal((8, 32))
    d = da.from_array(x, chunks=(4, 32))  # fft axis single-chunk
    got = getattr(da.fft, name)(d, norm=norm)
    want = getattr(np.fft, name)(x, norm=norm)
    assert_eq(got, want, rtol=1e-9)


@pytest.mark.parametrize("name", ["rfft", "irfft", "hfft", "ihfft"])
def test_fft_real_family(rng, name):
    x = rng.standard_normal((6, 16))
    if name in ("irfft", "hfft"):
        x = x + 1j * rng.standard_normal((6, 16))
    d = da.from_array(x, chunks=(3, 16))
    assert_eq(getattr(da.fft, name)(d), getattr(np.fft, name)(x), rtol=1e-8)


def test_fft_n_parameter(rng):
    x = rng.standard_normal((4, 12)) + 0j
    d = da.from_array(x, chunks=(2, 12))
    assert_eq(da.fft.fft(d, n=16), np.fft.fft(x, n=16), rtol=1e-9)
    assert_eq(da.fft.fft(d, n=8), np.fft.fft(x, n=8), rtol=1e-9)


def test_fft_axis_selection(rng):
    x = rng.standard_normal((16, 6)) + 0j
    d = da.from_array(x, chunks=(16, 3))
    assert_eq(da.fft.fft(d, axis=0), np.fft.fft(x, axis=0), rtol=1e-9)


def test_fft2_fftn(rng):
    x = rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8))
    d = da.from_array(x, chunks=8)
    assert_eq(da.fft.fft2(d), np.fft.fft2(x), rtol=1e-9)
    assert_eq(da.fft.ifft2(d), np.fft.ifft2(x), rtol=1e-9)
    assert_eq(da.fft.fftn(d), np.fft.fftn(x), rtol=1e-9)
    y = rng.standard_normal((4, 6))
    dy = da.from_array(y, chunks=(4, 6))
    assert_eq(da.fft.rfft2(dy), np.fft.rfft2(y), rtol=1e-9)


def test_fft_roundtrip(rng):
    x = rng.standard_normal((32,))
    d = da.from_array(x, chunks=32)
    assert_eq(da.fft.irfft(da.fft.rfft(d), n=32), x, rtol=1e-9)


def test_fftfreq_rfftfreq(rng):
    assert_eq(da.fft.fftfreq(17, d=0.25, chunks=5), np.fft.fftfreq(17, d=0.25))
    assert_eq(da.fft.rfftfreq(16, d=2.0, chunks=4), np.fft.rfftfreq(16, d=2.0))


def test_fftshift_ifftshift(rng):
    x = rng.standard_normal((9, 8))
    d = da.from_array(x, chunks=(3, 4))
    assert_eq(da.fft.fftshift(d), np.fft.fftshift(x))
    assert_eq(da.fft.ifftshift(d), np.fft.ifftshift(x))
    assert_eq(da.fft.fftshift(d, axes=1), np.fft.fftshift(x, axes=1))
    assert_eq(
        da.fft.ifftshift(da.fft.fftshift(d)), x
    )


def test_fft_wrap_custom(rng):
    # fft_wrap factory over numpy.fft functions (parity: fft.py:119)
    wrapped = da.fft.fft_wrap(np.fft.fft)
    x = rng.standard_normal((6, 10)) + 0j
    d = da.from_array(x, chunks=(3, 10))
    assert_eq(wrapped(d), np.fft.fft(x), rtol=1e-9)


def test_fft_chunked_axis_raises(rng):
    d = da.from_array(rng.standard_normal((16,)) + 0j, chunks=4)
    with pytest.raises(ValueError):
        da.fft.fft(d).compute()


# -- creation ------------------------------------------------------------------


def test_arange_variants():
    assert_eq(da.arange(10, chunks=3), np.arange(10))
    assert_eq(da.arange(2, 20, 3, chunks=4), np.arange(2, 20, 3))
    assert_eq(da.arange(5, 0, -1, chunks=2), np.arange(5, 0, -1))
    assert_eq(da.arange(0.0, 1.0, 0.13, chunks=3), np.arange(0.0, 1.0, 0.13))
    assert da.arange(10, chunks=3, dtype="f4").dtype == np.dtype("f4")


def test_linspace_variants():
    assert_eq(da.linspace(0, 1, 17, chunks=5), np.linspace(0, 1, 17))
    assert_eq(
        da.linspace(-3, 3, 10, endpoint=False, chunks=4),
        np.linspace(-3, 3, 10, endpoint=False),
    )
    got, step = da.linspace(0, 5, 9, retstep=True, chunks=3)
    want, wstep = np.linspace(0, 5, 9, retstep=True)
    assert_eq(got, want)
    assert step == wstep


def test_eye_offsets():
    for k in (-2, 0, 3):
        assert_eq(da.eye(7, chunks=3, k=k), np.eye(7, k=k))
    assert_eq(da.eye(5, M=8, chunks=2), np.eye(5, M=8))


def test_diag_extract_and_build(rng):
    v = rng.standard_normal((6,))
    dv = da.from_array(v, chunks=2)
    assert_eq(da.diag(dv), np.diag(v))
    m = rng.standard_normal((6, 6))
    dm = da.from_array(m, chunks=3)
    assert_eq(da.diag(dm), np.diag(m))


def test_diagonal_offsets(rng):
    m = rng.standard_normal((6, 8))
    dm = da.from_array(m, chunks=3)
    for off in (-1, 0, 2):
        assert_eq(da.diagonal(dm, offset=off), np.diagonal(m, offset=off))


def test_tri_family(rng):
    assert_eq(da.tri(5, chunks=2), np.tri(5))
    m = rng.standard_normal((6, 6))
    dm = da.from_array(m, chunks=2)
    for k in (-1, 0, 1):
        assert_eq(da.tril(dm, k=k), np.tril(m, k=k))
        assert_eq(da.triu(dm, k=k), np.triu(m, k=k))


def test_meshgrid_indices(rng):
    x = np.arange(4.0)
    y = np.arange(3.0)
    gx, gy = da.meshgrid(da.from_array(x, chunks=2), da.from_array(y, chunks=2))
    ex, ey = np.meshgrid(x, y)
    assert_eq(gx, ex)
    assert_eq(gy, ey)
    got = da.indices((3, 4), chunks=2)
    assert_eq(got, np.indices((3, 4)).astype(got.dtype))


def test_fromfunction():
    got = da.fromfunction(lambda i, j: i * 10 + j, (4, 5), chunks=2, dtype="f8")
    assert_eq(got, np.fromfunction(lambda i, j: i * 10 + j, (4, 5), dtype="f8"))


@pytest.mark.parametrize(
    "mode,kw",
    [
        ("constant", {"constant_values": 3.0}),
        ("edge", {}),
        ("reflect", {}),
        ("symmetric", {}),
        ("wrap", {}),
        ("maximum", {}),
        ("mean", {}),
        ("minimum", {}),
        ("linear_ramp", {"end_values": 2.0}),
    ],
)
def test_pad_modes(rng, mode, kw):
    x = rng.standard_normal((6, 5))
    d = da.from_array(x, chunks=(3, 5))
    assert_eq(da.pad(d, ((2, 1), (0, 2)), mode=mode, **kw), np.pad(x, ((2, 1), (0, 2)), mode=mode, **kw), rtol=1e-12)


def test_tile_repeat(rng):
    x = rng.standard_normal((3, 4))
    d = da.from_array(x, chunks=2)
    assert_eq(da.tile(d, 2), np.tile(x, 2))
    assert_eq(da.tile(d, (2, 3)), np.tile(x, (2, 3)))
    assert_eq(da.repeat(d, 3, axis=0), np.repeat(x, 3, axis=0))
    assert_eq(da.repeat(d, 2, axis=1), np.repeat(x, 2, axis=1))


def test_like_family(rng):
    x = rng.standard_normal((4, 6)).astype("f4")
    d = da.from_array(x, chunks=2)
    assert_eq(da.ones_like(d), np.ones_like(x))
    assert_eq(da.zeros_like(d), np.zeros_like(x))
    assert_eq(da.full_like(d, 2.5), np.full_like(x, 2.5))
    assert da.empty_like(d).shape == x.shape
    assert da.empty_like(d).dtype == x.dtype


def test_like_family_unknown_chunks(rng):
    # reference: tests/test_creation.py::test_nan_zeros_ones_like —
    # *_like of a boolean-masked (nan-chunk) array builds per-block on the
    # source so the unknown grid carries over
    x = rng.standard_normal((8, 3))
    d = da.from_array(x, chunks=(4, 3))
    m = d[d[:, 0] > 0]
    nm = x[x[:, 0] > 0]
    for fn, npfn in ((da.zeros_like, np.zeros_like), (da.ones_like, np.ones_like)):
        got = np.asarray(fn(m, dtype="f4").compute())
        want = npfn(nm, dtype="f4")
        assert got.dtype == want.dtype
        assert np.array_equal(got, want)
    got = np.asarray(da.full_like(m, 7).compute())
    assert np.array_equal(got, np.full_like(nm, 7))
    assert np.asarray(da.empty_like(m).compute()).shape == nm.shape
