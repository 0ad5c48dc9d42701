"""np.ma masked arrays on the host lane.

VERDICT round-2 missing item 3.  Reference scope (its full masked support
is the numpy-kernel passthrough + tokenize handler,
``_dispatch.py:36,248``, ``tests/test_collection.py:1322``): from_array of
a masked source, slicing (masked scalars survive), concat/stack/rechunk,
map_blocks with numpy.ma kernels, and a mask-aware tokenize.  Ops that
would silently DROP the mask through jnp raise NotImplementedError.
"""

import numpy as np
import pytest

import dask_array_tpu as da


@pytest.fixture
def marr():
    arr = np.ma.array(np.arange(100.0).reshape(10, 10), mask=False)
    arr[5, 5] = np.ma.masked
    return arr


def test_masked_from_array_slice_compute(marr):
    # reference tests/test_collection.py:1322 — the masked element survives
    x = da.from_array(marr, chunks=5)
    out = x[4:7, 4:7].compute()
    assert isinstance(out, np.ma.MaskedArray)
    assert out[1, 1] is np.ma.masked
    np.testing.assert_array_equal(out.filled(-1), marr[4:7, 4:7].filled(-1))


def test_masked_identity_compute(marr):
    x = da.from_array(marr, chunks=5)
    out = x.compute()
    assert isinstance(out, np.ma.MaskedArray)
    assert bool(out.mask[5, 5])


def test_masked_concat_stack_rechunk(marr):
    x = da.from_array(marr, chunks=5)
    c = da.concatenate([x, x]).compute()
    assert int(np.sum(np.ma.getmaskarray(c))) == 2
    s = da.stack([x, x]).compute()
    assert int(np.sum(np.ma.getmaskarray(s))) == 2
    r = x.rechunk(4).compute()
    assert bool(np.ma.getmaskarray(r)[5, 5])


def test_masked_map_blocks_numpy_ma_kernel(marr):
    x = da.from_array(marr, chunks=5)
    f = x.map_blocks(lambda b: np.ma.filled(b, -9.0), dtype="f8")
    out = f.compute()
    assert float(np.asarray(out)[5, 5]) == -9.0


def test_masked_arithmetic_raises(marr):
    x = da.from_array(marr, chunks=5)
    with pytest.raises(NotImplementedError, match="mask"):
        (x + 1).compute()
    with pytest.raises(NotImplementedError, match="mask"):
        x.sum().compute()
    with pytest.raises(NotImplementedError, match="mask"):
        da.compute(x + 1, x - 1)


def test_masked_tokenize_mask_is_identity():
    from dask_array_tpu.utils._tokenize import tokenize

    a1 = np.ma.array([1.0, 2.0], mask=[0, 1])
    a2 = np.ma.array([1.0, 2.0], mask=[0, 0])
    a3 = np.ma.array([1.0, 2.0], mask=[0, 1])
    assert tokenize(a1) != tokenize(a2)
    assert tokenize(a1) == tokenize(a3)


def test_masked_tokenize_ignores_bytes_under_mask():
    from dask_array_tpu.utils._tokenize import tokenize

    # same logical value, different garbage under the mask
    a1 = np.ma.array([1.0, 777.0], mask=[0, 1])
    a2 = np.ma.array([1.0, -5.0], mask=[0, 1])
    assert tokenize(a1) == tokenize(a2)
