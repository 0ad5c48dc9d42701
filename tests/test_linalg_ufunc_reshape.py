import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.ops import ufuncs as uf
from dask_array_tpu.ops.linalg import dot, einsum, matmul, outer, tensordot, vdot


def test_ufunc_table(rng):
    x = np.abs(rng.standard_normal((8, 9))) + 0.5
    d = da.from_array(x, chunks=(4, 3))
    assert_eq(uf.sqrt(d), np.sqrt(x))
    assert_eq(uf.exp(d), np.exp(x))
    assert_eq(uf.log(d), np.log(x))
    assert_eq(uf.sin(d) + uf.cos(d), np.sin(x) + np.cos(x))
    assert_eq(uf.maximum(d, 1.0), np.maximum(x, 1.0))
    assert_eq(uf.isfinite(d), np.isfinite(x))
    assert_eq(uf.clip(d, 0.6, 1.2), np.clip(x, 0.6, 1.2))
    assert_eq(uf.floor_divide(d, 0.3), np.floor_divide(x, 0.3))


def test_numpy_ufunc_protocol(rng):
    x = rng.standard_normal((6, 6))
    d = da.from_array(x, chunks=3)
    out = np.sqrt(np.abs(d))  # NEP-13 dispatch into our elemwise
    assert isinstance(out, da.Array)
    assert_eq(out, np.sqrt(np.abs(x)))
    out2 = np.add(d, 1.0)
    assert isinstance(out2, da.Array)
    assert_eq(out2, x + 1.0)


def test_ufunc_outer(rng):
    x = rng.standard_normal((5,))
    y = rng.standard_normal((7,))
    dx, dy = da.from_array(x, chunks=2), da.from_array(y, chunks=3)
    assert_eq(uf.add.outer(dx, dy), np.add.outer(x, y))
    assert_eq(uf.multiply.outer(dx, dy), np.multiply.outer(x, y))


def test_reshape(rng):
    x = rng.standard_normal((6, 4, 5))
    d = da.from_array(x, chunks=(2, 2, 5))
    assert_eq(d.reshape(6, 20), x.reshape(6, 20))
    assert_eq(d.reshape(-1), x.reshape(-1))
    assert_eq(d.reshape(24, 5), x.reshape(24, 5))
    assert_eq(d.reshape(2, 3, 4, 5), x.reshape(2, 3, 4, 5))
    assert_eq(d.ravel(), x.ravel())
    # chunk structure for a simple merge
    y = da.ones((4, 6), chunks=(2, 6))
    assert y.reshape(24).chunks == ((12, 12),)


def test_reshape_split_chunks():
    y = da.ones((24,), chunks=8)
    r = y.reshape(6, 4)
    assert_eq(r, np.ones((6, 4)))
    assert r.chunks == ((2, 2, 2), (4,))


def test_tensordot(rng):
    x = rng.standard_normal((12, 10)).astype("f8")
    y = rng.standard_normal((10, 8)).astype("f8")
    dx = da.from_array(x, chunks=(4, 5))
    dy = da.from_array(y, chunks=(5, 4))
    out = tensordot(dx, dy, axes=1)
    assert out.chunks == ((4, 4, 4), (4, 4))
    assert_eq(out, np.tensordot(x, y, axes=1), rtol=1e-10)
    z = rng.standard_normal((4, 10, 12))
    dz = da.from_array(z, chunks=(2, 5, 6))
    out2 = tensordot(dx, dz, axes=((1, 0), (1, 2)))
    assert_eq(out2, np.tensordot(x, z, axes=((1, 0), (1, 2))), rtol=1e-10)


def test_matmul_dot(rng):
    x = rng.standard_normal((9, 7))
    y = rng.standard_normal((7, 5))
    v = rng.standard_normal((7,))
    dx, dy, dv = da.from_array(x, chunks=3), da.from_array(y, chunks=3), da.from_array(v, chunks=3)
    assert_eq(dx @ dy, x @ y, rtol=1e-10)
    assert_eq(matmul(dx, dv), x @ v, rtol=1e-10)
    assert_eq(dot(dx, dy), np.dot(x, y), rtol=1e-10)
    assert_eq(vdot(dv, dv), np.vdot(v, v), rtol=1e-10)
    assert_eq(outer(dv, dv), np.outer(v, v), rtol=1e-10)
    # stacked matmul
    a = rng.standard_normal((3, 4, 5))
    b = rng.standard_normal((3, 5, 6))
    da_, db_ = da.from_array(a, chunks=(1, 2, 5)), da.from_array(b, chunks=(1, 5, 3))
    assert_eq(da_ @ db_, a @ b, rtol=1e-10)


def test_einsum(rng):
    x = rng.standard_normal((5, 6))
    y = rng.standard_normal((6, 7))
    dx, dy = da.from_array(x, chunks=2), da.from_array(y, chunks=3)
    assert_eq(einsum("ij,jk->ik", dx, dy), np.einsum("ij,jk->ik", x, y), rtol=1e-10)
    assert_eq(einsum("ij->ji", dx), np.einsum("ij->ji", x))
    assert_eq(einsum("ij->", dx), np.einsum("ij->", x), rtol=1e-10)
    assert_eq(einsum("ij,ij->i", dx, dx), np.einsum("ij,ij->i", x, x), rtol=1e-10)
    # implicit output + ellipsis
    assert_eq(einsum("ij,jk", dx, dy), np.einsum("ij,jk", x, y), rtol=1e-10)
    z = rng.standard_normal((4, 5, 6))
    dz = da.from_array(z, chunks=(2, 5, 3))
    assert_eq(einsum("...ij,jk->...ik", dz, dy), np.einsum("...ij,jk->...ik", z, y), rtol=1e-10)


def test_matmul_dtype():
    x = da.ones((4, 4), dtype="int32", chunks=2)
    assert (x @ x).dtype == (np.ones((4, 4), "int32") @ np.ones((4, 4), "int32")).dtype


def test_reshape_blockwise(rng):
    from dask_array_tpu.ops._reshape import reshape_blockwise

    x = rng.standard_normal((6, 4, 5))
    d = da.from_array(x, chunks=(2, 4, 5))
    out = reshape_blockwise(d, (6, 20))
    assert out.chunks == ((2, 2, 2), (20,))
    assert_eq(out, x.reshape(6, 20))
