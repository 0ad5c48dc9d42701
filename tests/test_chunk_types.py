"""Registered duck-array chunk types ride the host lane end-to-end.

Parity: ``register_chunk_type`` (``/root/reference/dask_array/
_chunk_types.py:31``) — a registered duck type is one dask_array "can
safely wrap as a chunk and to which dask_array does not defer in
arithmetic operations and NumPy functions/ufuncs".  Here duck blocks are
host-lane citizens: kernels run through the numpy API (NEP-13/NEP-18
dispatch) so the wrapper type survives from ``from_array`` to
``compute()``.
"""

from __future__ import annotations

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._dispatch import (
    _HANDLED_CHUNK_TYPES,
    is_duck_chunk,
    is_valid_array_chunk,
    is_valid_chunk_type,
    register_chunk_type,
)


def _unwrap(x):
    return x.arr if isinstance(x, WrappedArray) else x


class WrappedArray:
    """A minimal NEP-13/NEP-18 duck array wrapping a numpy buffer.

    The shape of dask's own test double (``EncapsulateNDArray`` in dask's
    test_dispatch.py): unwrap every operand, run the numpy op, re-wrap
    array results.
    """

    def __init__(self, arr):
        self.arr = np.asarray(arr)

    # -- array protocol -------------------------------------------------
    @property
    def shape(self):
        return self.arr.shape

    @property
    def dtype(self):
        return self.arr.dtype

    @property
    def ndim(self):
        return self.arr.ndim

    @property
    def size(self):
        return self.arr.size

    def __len__(self):
        return len(self.arr)

    def __getitem__(self, idx):
        idx = tuple(_unwrap(i) for i in idx) if isinstance(idx, tuple) else _unwrap(idx)
        return _rewrap(self.arr[idx])

    def astype(self, dtype, **kwargs):
        return WrappedArray(self.arr.astype(dtype, **kwargs))

    def reshape(self, *shape):
        return WrappedArray(self.arr.reshape(*shape))

    def __array__(self, dtype=None, copy=None):
        # densification escape hatch (tests assert the TYPE explicitly, so
        # any silent np.asarray on the lane shows up as a failure)
        out = self.arr
        return out.astype(dtype) if dtype is not None else out

    # -- NEP-13 / NEP-18 -------------------------------------------------
    __array_priority__ = 20.0

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if kwargs.get("out") is not None:
            return NotImplemented
        inputs = tuple(_unwrap(i) for i in inputs)
        return _rewrap(getattr(ufunc, method)(*inputs, **kwargs))

    def __array_function__(self, func, types, args, kwargs):
        args = _tree_unwrap(args)
        kwargs = _tree_unwrap(kwargs)
        return _rewrap(func(*args, **kwargs))

    # python operators route through numpy's ufunc machinery
    def __add__(self, other):
        return np.add(self, other)

    def __radd__(self, other):
        return np.add(other, self)

    def __mul__(self, other):
        return np.multiply(self, other)

    def __sub__(self, other):
        return np.subtract(self, other)


def _rewrap(x):
    if isinstance(x, (list, tuple)):
        return type(x)(_rewrap(v) for v in x)
    return WrappedArray(x) if isinstance(x, np.ndarray) and x.ndim > 0 else x


def _tree_unwrap(x):
    if isinstance(x, WrappedArray):
        return x.arr
    if isinstance(x, (list, tuple)):
        return type(x)(_tree_unwrap(v) for v in x)
    if isinstance(x, dict):
        return {k: _tree_unwrap(v) for k, v in x.items()}
    return x


@pytest.fixture(scope="module", autouse=True)
def _registered():
    register_chunk_type(WrappedArray)
    yield
    # keep the module-global registry clean for other test modules
    _HANDLED_CHUNK_TYPES.remove(WrappedArray)
    import dask_array_tpu._dispatch as _disp

    _disp._DUCK_TYPES = tuple(
        t
        for t in _HANDLED_CHUNK_TYPES
        if isinstance(t, type) and not issubclass(t, np.ndarray)
    )


def _wrapped(shape=(10, 8), chunks=(4, 5), seed=0):
    rng = np.random.default_rng(seed)
    buf = rng.standard_normal(shape)
    return da.from_array(WrappedArray(buf), chunks=chunks), buf


def _check(result, expect, exact_type=WrappedArray):
    assert isinstance(result, exact_type), type(result)
    np.testing.assert_allclose(_unwrap(result), expect, rtol=1e-6, atol=1e-12)


# -- registry -------------------------------------------------------------


def test_registry_predicates():
    assert is_valid_chunk_type(WrappedArray)
    assert is_valid_chunk_type(np.ndarray)
    assert is_valid_array_chunk(WrappedArray(np.ones(3)))
    assert is_valid_array_chunk(np.ones(3))
    assert is_valid_array_chunk(None)
    assert is_duck_chunk(WrappedArray(np.ones(3)))
    assert not is_duck_chunk(np.ones(3))
    assert not is_duck_chunk(np.ma.masked_array([1.0], mask=[True]))


def test_masked_is_a_default_chunk_type():
    # reference default registry: [np.ndarray, np.ma.MaskedArray]
    assert is_valid_chunk_type(np.ma.MaskedArray)


# -- construction / compute ------------------------------------------------


def test_from_array_keeps_duck_type():
    x, buf = _wrapped()
    assert x.dtype == buf.dtype
    assert x.chunks == ((4, 4, 2), (5, 3))
    _check(x.compute(), buf)


def test_elemwise_preserves_type():
    x, buf = _wrapped()
    _check((x + 1).compute(), buf + 1)
    _check((x * 2 - x).compute(), buf * 2 - buf)
    _check(np.sqrt(np.abs(x)).compute(), np.sqrt(np.abs(buf)))


def test_mixed_duck_and_plain_leaves():
    x, buf = _wrapped()
    other = np.arange(8.0)
    y = da.from_array(other, chunks=5)
    _check((x + y).compute(), buf + other)


def test_binary_op_with_raw_duck_operand_does_not_defer():
    # da.Array op WrappedArray: dask claims registered types (NEP-13
    # "does not defer"); the result is a lazy Array, not a WrappedArray
    x, buf = _wrapped()
    out = x + WrappedArray(np.ones((10, 8)))
    assert isinstance(out, da.Array)
    _check(out.compute(), buf + 1)


def test_slicing_and_take_preserve_type():
    x, buf = _wrapped()
    _check(x[2:7, 1:].compute(), buf[2:7, 1:])
    _check(x[[3, 1, 7]].compute(), buf[[3, 1, 7]])
    _check(x[:, [0, 6, 2]].compute(), buf[:, [0, 6, 2]])


def test_transpose_squeeze_reshape():
    x, buf = _wrapped()
    _check(x.T.compute(), buf.T)
    y = da.from_array(WrappedArray(buf[None]), chunks=(1, 4, 5))
    _check(y.squeeze(axis=0).compute(), buf)
    _check(x.reshape(20, 4).compute(), buf.reshape(20, 4))


def test_concatenate_stack_preserve_type():
    x, buf = _wrapped()
    y, buf2 = _wrapped(seed=1)
    _check(da.concatenate([x, y], axis=0).compute(), np.concatenate([buf, buf2], 0))
    _check(da.stack([x, y], axis=0).compute(), np.stack([buf, buf2], 0))


def test_rechunk_preserves_type():
    x, buf = _wrapped()
    _check(x.rechunk((3, 8)).compute(), buf)


def test_reductions_preserve_type():
    x, buf = _wrapped()
    _check(x.sum(axis=0).compute(), buf.sum(axis=0))
    _check(x.mean(axis=1).compute(), buf.mean(axis=1))
    got_max = x.max().compute()
    np.testing.assert_allclose(float(_unwrap(got_max)), buf.max())


def test_argreduction_on_duck():
    x, buf = _wrapped()
    got = x.argmax(axis=0).compute()
    np.testing.assert_array_equal(np.asarray(_unwrap(got)), buf.argmax(axis=0))


def test_cumsum_preserves_type():
    x, buf = _wrapped()
    _check(x.cumsum(axis=0).compute(), buf.cumsum(axis=0))


def test_map_blocks_with_duck_kernel():
    x, buf = _wrapped()
    out = x.map_blocks(lambda b: b * 2, dtype=x.dtype)
    _check(out.compute(), buf * 2)


def test_compute_many_returns_duck():
    x, buf = _wrapped()
    a, b = da.compute(x + 1, x.sum(axis=0))
    _check(a, buf + 1)
    _check(b, buf.sum(axis=0))


def test_unregistered_duck_densifies_via_array():
    # an UNregistered array-like with __array__ coerces to numpy blocks
    # (the pre-existing contract): values correct, type not preserved
    class Plain:
        def __init__(self, arr):
            self.arr = np.asarray(arr)

        shape = property(lambda self: self.arr.shape)
        dtype = property(lambda self: self.arr.dtype)
        ndim = property(lambda self: self.arr.ndim)

        def __getitem__(self, idx):
            return self.arr[idx]

        def __array__(self, dtype=None, copy=None):
            return self.arr

    buf = np.arange(12.0).reshape(3, 4)
    x = da.from_array(Plain(buf), chunks=2)
    out = (x + 1).compute()
    assert not isinstance(out, WrappedArray)
    np.testing.assert_array_equal(np.asarray(out), buf + 1)
