"""tiledb IO code paths EXECUTE (against an API-faithful in-memory fake).

The tiledb package is not installable in this image; these tests inject a
fake module implementing exactly the API surface ``io/_tiledb.py`` uses
(open/schema/domain/attr/getitem-dict/empty_like/setitem), so the
integration code runs instead of gate-skipping.  When real tiledb exists
it is used untouched (the fake only installs when the import fails).
"""

import sys
import types

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


class _FakeDim:
    def __init__(self, size, tile):
        self.size = size
        self.tile = tile


class _FakeDomain:
    def __init__(self, dims):
        self._dims = dims

    def dim(self, i):
        return self._dims[i]


class _FakeAttr:
    def __init__(self, name, dtype):
        self.name = name
        self.dtype = dtype


class _FakeSchema:
    def __init__(self, shape, tiles, dtype, attr_name=""):
        self.domain = _FakeDomain([_FakeDim(s, t) for s, t in zip(shape, tiles)])
        self.ndim = len(shape)
        self._attr = _FakeAttr(attr_name, dtype)

    def attr(self, i_or_name):
        return self._attr


class FakeTileDBArray:
    def __init__(self, data, tiles, attr_name=""):
        self._data = np.asarray(data)
        self.schema = _FakeSchema(self._data.shape, tiles, self._data.dtype, attr_name)
        self._attr_name = attr_name

    def __getitem__(self, sl):
        return {self._attr_name: self._data[sl]}

    def __setitem__(self, sl, value):
        self._data[sl] = value


def _install_fake(monkeypatch, registry):
    try:
        import tiledb  # noqa: F401

        pytest.skip("real tiledb installed; fake not applicable")
    except ImportError:
        pass
    mod = types.ModuleType("tiledb")
    mod.Array = FakeTileDBArray
    mod.open = lambda uri, **kw: registry[uri]

    def empty_like(uri, darray, key=None, **kw):
        arr = FakeTileDBArray(
            np.zeros(darray.shape, dtype=darray.dtype),
            tuple(c[0] for c in darray.chunks),
        )
        registry[uri] = arr
        return arr

    mod.empty_like = empty_like
    monkeypatch.setitem(sys.modules, "tiledb", mod)
    return mod


@pytest.fixture
def rng():
    return np.random.default_rng(97)


def test_from_tiledb_reads_by_tile(rng, monkeypatch):
    registry = {}
    _install_fake(monkeypatch, registry)
    x = rng.standard_normal((12, 8))
    registry["mem://a"] = FakeTileDBArray(x, tiles=(4, 4))
    arr = da.from_tiledb("mem://a")
    assert arr.chunks == ((4, 4, 4), (4, 4))  # chunks follow the tile grid
    assert_eq(arr, x)
    # partial read culls untouched tiles (slice pushdown into from_map)
    assert_eq(arr[:4, :4], x[:4, :4])


def test_from_tiledb_explicit_chunks(rng, monkeypatch):
    registry = {}
    _install_fake(monkeypatch, registry)
    x = rng.standard_normal((10,))
    registry["mem://b"] = FakeTileDBArray(x, tiles=(5,))
    arr = da.from_tiledb("mem://b", chunks=(2,))
    assert arr.chunks == ((2,) * 5,)
    assert_eq(arr, x)


def test_to_tiledb_roundtrip(rng, monkeypatch):
    registry = {}
    _install_fake(monkeypatch, registry)
    x = rng.standard_normal((8, 6))
    d = da.from_array(x, chunks=(4, 3)) * 2
    da.to_tiledb(d, "mem://out")
    np.testing.assert_allclose(registry["mem://out"]._data, x * 2)
    back = da.from_tiledb("mem://out")
    assert_eq(back, x * 2)


def test_to_tiledb_compute_false(rng, monkeypatch):
    registry = {}
    _install_fake(monkeypatch, registry)
    x = rng.standard_normal((6,))
    d = da.from_array(x, chunks=3)
    handle = da.to_tiledb(d, "mem://lazy", compute=False)
    assert registry["mem://lazy"]._data.sum() == 0  # nothing written yet
    handle.compute()
    np.testing.assert_allclose(registry["mem://lazy"]._data, x)


def test_tiledb_gated_without_lib(monkeypatch):
    try:
        import tiledb  # noqa: F401

        pytest.skip("real tiledb installed")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="tiledb"):
        da.from_tiledb("mem://nope")
