"""IO/store edge cases ported from the reference's test suites.

Case sources: store compute=False / return_stored
(``tests/test_collection.py:329-405``), store regions (``:406``),
from_map block culling (``tests/test_from_map.py``), from_delayed,
fft family corners (``tests/test_fft.py``), random determinism
(``tests/test_random.py``).
"""

from __future__ import annotations

import numpy as np
import pytest

import dask_array_tpu as da


@pytest.fixture
def rng():
    return np.random.default_rng(31)


def test_store_compute_false(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    tgt = np.zeros((6, 8))
    delayed = da.store(d, tgt, compute=False)
    assert not np.any(tgt)  # nothing written yet
    delayed.compute()
    np.testing.assert_allclose(tgt, x)


def test_store_return_stored(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    tgt = np.zeros((6, 8))
    out = da.store(d, tgt, return_stored=True)
    arr = out[0] if isinstance(out, (list, tuple)) else out
    np.testing.assert_allclose(np.asarray(arr.compute()), x)
    np.testing.assert_allclose(tgt, x)


def test_store_regions_multiple(rng):
    x = rng.standard_normal((3, 4))
    d = da.from_array(x, chunks=2)
    tgt = np.zeros((6, 8))
    da.store(d, tgt, regions=(slice(0, 3), slice(2, 6)))
    np.testing.assert_allclose(tgt[0:3, 2:6], x)

    a, b = rng.standard_normal((4, 4)), rng.standard_normal((4, 4))
    t1, t2 = np.zeros((4, 4)), np.zeros((4, 4))
    da.store([da.from_array(a, chunks=2), da.from_array(b, chunks=2)], [t1, t2])
    np.testing.assert_allclose(t1, a)
    np.testing.assert_allclose(t2, b)


def test_from_map_only_computes_needed_blocks():
    calls = []

    def make(i):
        calls.append(i)
        return np.full((3,), float(i))

    d = da.from_map(make, range(4), chunks=((3, 3, 3, 3),), dtype="f8")
    got = np.asarray(d[6:9].compute())  # block 2 only
    np.testing.assert_allclose(got, np.full(3, 2.0))
    assert set(calls) <= {2}, calls


def test_from_delayed():
    v = da.from_delayed(lambda: np.ones((2, 2)), shape=(2, 2), dtype="f8")
    np.testing.assert_allclose(np.asarray(v.compute()), np.ones((2, 2)))


def test_fft_n_kwarg_pad_trim(rng):
    x = rng.standard_normal(16)
    d = da.from_array(x, chunks=16)
    np.testing.assert_allclose(np.asarray(da.fft.fft(d, n=20).compute()), np.fft.fft(x, n=20), atol=1e-8)
    np.testing.assert_allclose(np.asarray(da.fft.fft(d, n=8).compute()), np.fft.fft(x, n=8), atol=1e-8)


def test_hfft_ihfft(rng):
    x = rng.standard_normal(16) + 1j * rng.standard_normal(16)
    d = da.from_array(x, chunks=16)
    np.testing.assert_allclose(np.asarray(da.fft.hfft(d).compute()), np.fft.hfft(x), atol=1e-8)
    y = rng.standard_normal(16)
    dy = da.from_array(y, chunks=16)
    np.testing.assert_allclose(np.asarray(da.fft.ihfft(dy).compute()), np.fft.ihfft(y), atol=1e-8)


def test_fftn_axes_chunked_elsewhere(rng):
    x = rng.standard_normal((8, 8, 8))
    d = da.from_array(x, chunks=(4, 8, 8))
    np.testing.assert_allclose(
        np.asarray(da.fft.fftn(d, axes=(1, 2)).compute()), np.fft.fftn(x, axes=(1, 2)), atol=1e-8
    )


def test_random_seed_reproducible_blocks_independent():
    a = np.asarray(da.random.default_rng(42).standard_normal((8, 8), chunks=4).compute())
    b = np.asarray(da.random.default_rng(42).standard_normal((8, 8), chunks=4).compute())
    np.testing.assert_array_equal(a, b)
    blocks = [a[:4, :4], a[:4, 4:], a[4:, :4], a[4:, 4:]]
    for i in range(4):
        for j in range(i + 1, 4):
            assert not np.array_equal(blocks[i], blocks[j])


def test_choice_with_p():
    v = np.array([1.0, 2.0, 3.0, 4.0])
    p = np.array([0.1, 0.2, 0.3, 0.4])
    out = np.asarray(da.random.default_rng(0).choice(v, size=1000, p=p, chunks=100).compute())
    assert set(np.unique(out)) <= set(v)
    assert 0.3 < (out == 4.0).mean() < 0.5


def test_from_array_hdf5_dataset_naming(tmp_path):
    # reference test_hdf5.py naming spine: an h5py dataset cannot be
    # content-tokenized — the identity fallback must give a STABLE name
    # (keys are the program's identity), and explicit name= is verbatim
    h5py = pytest.importorskip("h5py")
    x = np.arange(24.0).reshape(4, 6)
    fn = str(tmp_path / "n.h5")
    d = da.from_array(x, chunks=(2, 3))
    da.to_hdf5(fn, "/data/x", d)
    with h5py.File(fn, "r") as f:
        e = da.from_array(f["/data/x"], chunks=(2, 3))
        assert e.name == e.expr._name  # stable across accesses
        np.testing.assert_array_equal(np.asarray(e.compute()), x)
        e2 = da.from_array(f["/data/x"], chunks=(2, 3), name="my-hdf5-data")
        assert e2.name == "my-hdf5-data"
        np.testing.assert_array_equal(np.asarray(e2.compute()), x)
