"""Dtype-matrix coverage: int/bool/complex/float32 through the op families."""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


@pytest.mark.parametrize("dtype", ["int32", "int64", "uint8", "float32", "float64", "bool"])
def test_elemwise_reduction_dtypes(rng, dtype):
    if dtype == "bool":
        x = rng.standard_normal((8, 8)) > 0
    elif "int" in dtype:
        x = rng.integers(0, 100, (8, 8)).astype(dtype)
    else:
        x = rng.standard_normal((8, 8)).astype(dtype)
    d = da.from_array(x, chunks=4)
    assert_eq(d + d, x + x)
    assert_eq(d.sum(), x.sum())
    assert_eq(d.sum(axis=0), x.sum(axis=0))
    if dtype != "bool":
        assert_eq(d.max(axis=1), x.max(axis=1))
        assert_eq(d.T, x.T)
        assert_eq(d[2:6, ::2], x[2:6, ::2])


def test_complex_support(rng):
    x = (rng.standard_normal((6, 6)) + 1j * rng.standard_normal((6, 6))).astype("complex128")
    d = da.from_array(x, chunks=3)
    assert_eq(d + d, x + x)
    assert_eq(d.conj(), x.conj())
    assert_eq(d.real, x.real)
    assert_eq(d.imag, x.imag)
    assert_eq(abs(d), abs(x))
    assert_eq(d.sum(), x.sum())
    assert_eq((d @ d).astype("complex128"), x @ x, rtol=1e-10)
    assert_eq(da.fft.fft(d.rechunk((6, 6))), np.fft.fft(x))


def test_mixed_dtype_promotion(rng):
    xi = rng.integers(0, 10, (6,)).astype("int16")
    xf = rng.standard_normal((6,)).astype("float32")
    di, df = da.from_array(xi, chunks=3), da.from_array(xf, chunks=3)
    assert_eq(di + df, xi + xf)
    assert_eq(di * True, xi * True)
    assert_eq(df / 2, xf / 2)
    assert_eq(da.concatenate([di, df.astype("int16")]), np.concatenate([xi, xf.astype("int16")]))


def test_bool_reductions(rng):
    x = rng.standard_normal((10, 10)) > 0.2
    d = da.from_array(x, chunks=5)
    assert_eq(d.any(axis=0), x.any(axis=0))
    assert_eq(d.all(axis=1), x.all(axis=1))
    assert_eq(d.sum(), x.sum())  # bool sum promotes to int
    assert_eq(~d, ~x)
    assert_eq(d & d, x & x)
    assert_eq(d | ~d, x | ~x)


def test_config_kwarg_form():
    from dask_array_tpu import config

    with config.set(array__rechunk__threshold=7):
        assert config.get("array.rechunk.threshold") == 7
    assert config.get("array.rechunk.threshold") == 32
