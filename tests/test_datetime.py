"""datetime64/timedelta64 support (the "datetime shim").

jax has no datetime dtypes; blocks ship to device as int64 tick views
(``_executor._materialize_buf``), the logical dtype lives in expression
metadata, and ``compute_to_numpy`` restores it.  Unit conversions run on
ticks — linear units by integer ratio, calendar units (M/Y) via the civil
calendar in integer jnp ops (``ops/_casting.py``).

Reference: ``tests/test_reductions.py::test_reductions_1D_datetime`` /
``::test_reductions_2D_datetime``.
"""

from __future__ import annotations

import numpy as np
import pytest

import dask_array_tpu as da


@pytest.fixture
def t():
    return np.array(
        ["2010-01-01", "2011-06-01", "2009-03-05", "2012-01-01", "2010-07-04"],
        dtype="M8[D]",
    )


def eq(a, b):
    got = np.asarray(a.compute())
    want = np.asarray(b)
    assert got.dtype == want.dtype, (got.dtype, want.dtype)
    assert np.array_equal(got, want), (got, want)


def test_roundtrip_slice_concat(t):
    d = da.from_array(t, chunks=2)
    eq(d, t)
    eq(d[1:4], t[1:4])
    eq(da.concatenate([d, d]), np.concatenate([t, t]))
    eq(da.repeat(d, 2), np.repeat(t, 2))
    eq(d.rechunk(3), t)


def test_datetime_reductions(t):
    d = da.from_array(t, chunks=2)
    eq(d.max(), t.max())
    eq(d.min(), t.min())
    assert int(d.argmax().compute()) == int(np.argmax(t))
    # 2-D
    t2 = t[:4].reshape(2, 2)
    d2 = da.from_array(t2, chunks=1)
    eq(d2.min(axis=0), t2.min(axis=0))
    eq(d2.max(axis=1), t2.max(axis=1))


def test_datetime_arithmetic(t):
    d = da.from_array(t, chunks=2)
    eq(d - d[0], t - t[0])
    td = t - t[0]
    eq(d + td, t + td)
    eq(da.diff(d), np.diff(t))


def test_datetime_compare_where(t):
    d = da.from_array(t, chunks=2)
    eq(d > t[1], t > t[1])
    eq(da.where(d > t[1], d, d[0]), np.where(t > t[1], t, t[0]))
    eq(da.isnull(d), np.isnat(t))


def test_datetime_persist(t):
    d = da.from_array(t, chunks=2).persist()
    eq(d, t)
    eq(d.max(), t.max())
    assert d.dtype == t.dtype


def test_timedelta_reductions(t):
    td = t - t[0]
    d = da.from_array(td, chunks=2)
    eq(d.sum(), td.sum())
    eq(d.max(), td.max())


@pytest.mark.parametrize("unit", ["s", "m", "h", "W", "M", "Y", "ms", "ns"])
def test_datetime_unit_conversion(unit):
    rng = np.random.default_rng(5)
    t = rng.integers(-40000, 40000, size=200).astype("M8[D]")
    d = da.from_array(t, chunks=37)
    eq(d.astype(f"M8[{unit}]"), t.astype(f"M8[{unit}]"))


@pytest.mark.parametrize("srcunit,unit", [("s", "D"), ("s", "M"), ("s", "Y"), ("M", "D"), ("M", "s"), ("M", "Y")])
def test_datetime_unit_conversion_various_sources(srcunit, unit):
    rng = np.random.default_rng(6)
    if srcunit == "s":
        t = (rng.integers(-40000, 40000, 150) * 86400 + rng.integers(0, 86400, 150)).astype("M8[s]")
    else:
        t = rng.integers(-1000, 1000, size=150).astype("M8[M]")
    d = da.from_array(t, chunks=29)
    eq(d.astype(f"M8[{unit}]"), t.astype(f"M8[{unit}]"))


@pytest.mark.parametrize("unit", ["ms", "m", "h", "D"])
def test_timedelta_unit_conversion(unit):
    rng = np.random.default_rng(7)
    td = rng.integers(-(10**6), 10**6, size=100).astype("m8[s]")
    d = da.from_array(td, chunks=13)
    eq(d.astype(f"m8[{unit}]"), td.astype(f"m8[{unit}]"))


def test_datetime_to_int(t):
    d = da.from_array(t, chunks=2)
    eq(d.astype("i8"), t.astype("i8"))
