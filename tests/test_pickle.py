"""Pickle roundtrips of lazy collections.

Reference: ``tests/test_collection.py::test_array_pickle_drops_lowered_expr_cache``
(+ the other pickle tests at ``:52-112``) — expressions pickle by (class,
operands); names survive; caches are rebuilt on load.  jax callables in
operands are encoded by public attribute path (``utils/_pickle.py``)
because ``jnp.ufunc`` wrappers defeat stock pickle-by-qualname.
"""

from __future__ import annotations

import pickle

import numpy as np
import pytest

import dask_array_tpu as da


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def rt(a):
    return pickle.loads(pickle.dumps(a))


def eq(a, b, **kw):
    np.testing.assert_allclose(np.asarray(a.compute()), b, **kw)


def _double(block):
    return block * 2


def test_elemwise_pickle(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    eq(rt(d + 1), x + 1)
    eq(rt(da.sqrt(d * d)), np.sqrt(x * x), rtol=1e-8)


def test_pickle_preserves_name(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    y = d + 1
    assert rt(y).name == y.name
    # class identity and chunks too
    assert rt(y).chunks == y.chunks
    assert type(rt(y).expr) is type(y.expr)


def test_pickle_drops_caches(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    y = (d + 1).sum(axis=0)
    _ = y.optimize()  # populate lowering caches
    y2 = rt(y)
    # unpickled expr rebuilds from operands only — no stale cached state
    assert "_meta" not in y2.expr.__dict__ or y2.expr._meta.dtype == y.dtype
    eq(y2, (x + 1).sum(axis=0), rtol=1e-8)


def test_pickle_shared_subtree(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    z = (d + 1) * (d + 1).sum()
    z2 = rt(z)
    # DAG sharing and optimized names survive the roundtrip
    assert z2.optimize().name == z.optimize().name
    eq(z2, (x + 1) * (x + 1).sum(), rtol=1e-8)


def test_pickle_across_families(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    eq(rt(d @ d.T), x @ x.T, rtol=1e-8)
    eq(rt(d.sum(axis=0)), x.sum(axis=0), rtol=1e-8)
    eq(rt((d * 3)[1:4, ::2]), (x * 3)[1:4, ::2])
    eq(rt(d[np.array([0, 2, 4])]), x[[0, 2, 4]])
    eq(rt(da.map_overlap(_double, d, depth=1)), x * 2)
    eq(rt(d.rechunk((2, 8))), x)
    eq(rt(da.concatenate([d, d], axis=0)), np.concatenate([x, x], axis=0))


def test_pickle_random(rng):
    a = da.random.default_rng(5).standard_normal((4, 6), chunks=2)
    eq(rt(a), np.asarray(a.compute()))


def test_persisted_pickle(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4)).persist()
    p = rt(d * 2)
    eq(p, x * 2)
    # persist name pin survives
    assert rt(d).name == d.name


def test_astype_unsigned_numpy_parity(rng):
    # numpy float->unsigned truncates toward zero then wraps; XLA clamps —
    # the cast routes through int64 to match numpy (ops/_casting.py)
    x = rng.standard_normal((6, 8)) * 10
    d = da.from_array(x, chunks=(3, 4))
    for dt in ("uint8", "uint16", "uint32", "uint64", "int8", "int32"):
        got = np.asarray(d.astype(dt).compute())
        want = x.astype(dt)
        assert got.dtype == want.dtype
        assert np.array_equal(got, want), dt


def test_field_access_expr_pickles():
    # round 3: field access works through the structured host lane — and
    # the Field expression round-trips through pickle like any other node
    import pickle

    s = np.array([(1, 2.0), (3, 4.0)], dtype=[("a", "i4"), ("b", "f8")])
    d = da.from_array(s, chunks=1)
    y = d["b"] * 2
    z = pickle.loads(pickle.dumps(y))
    np.testing.assert_allclose(z.compute(), s["b"] * 2)


def test_lambda_still_rejected(rng):
    # stock-pickle semantics (reference parity: dask without cloudpickle):
    # locally-defined callables do not pickle
    x = rng.standard_normal((4, 4))
    d = da.from_array(x, chunks=2)
    y = d.map_blocks(lambda b: b + 1)
    with pytest.raises(Exception):
        pickle.dumps(y)
