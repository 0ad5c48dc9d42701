"""Identity/contract tests (parity: test_stable_names.py,
test_lazy_metadata.py, test_public_namespace.py in the reference suite)."""

import json
import os

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


# ---------------------------------------------------------------------------
# stable names
# ---------------------------------------------------------------------------


def test_names_deterministic(rng):
    x = rng.standard_normal((10, 10))
    a1 = da.from_array(x, chunks=5) + 1
    a2 = da.from_array(x, chunks=5) + 1
    assert a1.name == a2.name
    # structurally identical expressions ARE the same singleton
    assert a1.expr is a2.expr


def test_name_never_changes_under_optimize():
    y = (da.ones((100, 100), chunks=10) + 1)[:20]
    name = y.name
    y.optimize()
    _ = y.compute()
    assert y.name == name


def test_simplified_tree_name_equality():
    """Optimization correctness asserted by name equality of simplified
    trees (the reference's structural-test idiom)."""
    x = da.ones((50, 50), chunks=10)
    a = (x + x.T)[:20, :20].expr.simplify()
    b = (da.ones((20, 20), chunks=10) + da.ones((20, 20), chunks=10).T).expr.simplify()
    assert a._name == b._name, (a.tree_repr(), b.tree_repr())


def test_persist_name_preserved(rng):
    x = rng.standard_normal((8, 8))
    d = (da.from_array(x, chunks=4) * 2).persist()
    d2 = da.from_array(x, chunks=4) * 2
    assert d.name == d2.name


# ---------------------------------------------------------------------------
# lazy metadata: no compute during construction/meta access
# ---------------------------------------------------------------------------


def test_metadata_is_lazy(rng):
    calls = []

    def loader(i):
        calls.append(i)
        return np.ones((5, 5))

    d = da.from_map(loader, range(4), chunks=((5, 5, 5, 5), (5,)), shape=(20, 5), dtype="f8")
    y = ((d + 1).T)[:3]
    _ = y.shape, y.chunks, y.dtype, y.name
    _ = y.expr.optimize()
    assert calls == []  # nothing loaded yet
    _ = y.compute()
    assert len(calls) > 0


def test_chunks_dont_lower():
    y = da.ones((100,), chunks=10).sum(axis=0)
    # accessing metadata never runs the optimizer
    assert y.shape == ()
    assert y.dtype == np.float64


# ---------------------------------------------------------------------------
# public namespace parity
# ---------------------------------------------------------------------------

# reference names we intentionally do not provide (with reasons)
KNOWN_MISSING = {
    "compute",  # provided (module-level) — sanity-checked separately
}


def test_public_namespace_parity():
    here = os.path.dirname(__file__)
    with open(os.path.join(here, "reference_namespace.json")) as f:
        names = json.load(f)
    missing = [n for n in names if not hasattr(da, n)]
    assert not missing, f"missing {len(missing)} reference names: {missing}"


def test_constants_and_dtypes():
    assert da.nan is np.nan
    assert da.newaxis is None
    assert da.pi == np.pi
    assert da.float64 is np.float64
    assert da.int32 is np.int32


def test_array_protocol_roundtrip(rng):
    x = rng.standard_normal((4, 4))
    d = da.from_array(x, chunks=2)
    np.testing.assert_allclose(np.asarray(d), x)
    assert np.mean(d).compute() == pytest.approx(x.mean())


def test_ufunc_reduce_protocol(rng):
    x = rng.standard_normal((6, 4))
    d = da.from_array(x, chunks=2)
    np.testing.assert_allclose(np.add.reduce(d).compute(), np.add.reduce(x))
    np.testing.assert_allclose(
        np.maximum.reduce(d, axis=1).compute(), np.maximum.reduce(x, axis=1)
    )
    np.testing.assert_allclose(
        np.multiply.reduce(d, axis=None).compute(), np.multiply.reduce(x, axis=None)
    )
