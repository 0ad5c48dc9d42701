"""Structural compiled-function cache: same-shaped data reuses executables;
sharing patterns and literals key differently (no silent wrong reuse)."""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._executor import _fn_cache, structural_key


def _nkeys():
    return len(_fn_cache)


def test_same_structure_shares_executable(rng):
    x1 = rng.standard_normal((16, 16))
    x2 = rng.standard_normal((16, 16))
    a = (da.from_array(x1, chunks=8) + 1).sum(axis=0)
    b = (da.from_array(x2, chunks=8) + 1).sum(axis=0)
    assert a.name != b.name  # different data -> different expressions
    assert structural_key(a.expr.optimize()) == structural_key(b.expr.optimize())
    before = _nkeys()
    ra = a.compute()
    after_first = _nkeys()
    rb = b.compute()
    assert _nkeys() == after_first  # second compute hit the cache
    np.testing.assert_allclose(ra, (x1 + 1).sum(axis=0))
    np.testing.assert_allclose(rb, (x2 + 1).sum(axis=0))  # values still correct!


def test_literals_key_differently(rng):
    x = rng.standard_normal((8, 8))
    d = da.from_array(x, chunks=4)
    k1 = structural_key((d + 3.5).expr)
    k2 = structural_key((d + 4.5).expr)
    assert k1 != k2  # scalar literals are baked into the trace
    np.testing.assert_allclose((d + 3.5).compute(), x + 3.5)
    np.testing.assert_allclose((d + 4.5).compute(), x + 4.5)


def test_sharing_pattern_keys_differently(rng):
    x = rng.standard_normal((8, 8))
    y = rng.standard_normal((8, 8))
    dx, dy = da.from_array(x, chunks=4), da.from_array(y, chunks=4)
    t1 = dx * dx + dy  # leaf A used twice
    t2 = dx + dy * dy  # leaf B used twice
    assert structural_key(t1.expr) != structural_key(t2.expr)
    np.testing.assert_allclose(t1.compute(), x * x + y)
    np.testing.assert_allclose(t2.compute(), x + y * y)


def test_dtype_and_chunks_key_differently(rng):
    x = rng.standard_normal((8, 8))
    d1 = da.from_array(x, chunks=4) + 1
    d2 = da.from_array(x.astype("f4"), chunks=4) + 1
    d3 = da.from_array(x, chunks=2) + 1
    ks = {structural_key(d.expr) for d in (d1, d2, d3)}
    assert len(ks) == 3


def test_persist_substitution_not_undone_by_singleton(rng):
    """Parents of a name-pinned Persisted leaf must be DISTINCT expressions
    from parents of the original leaf (regression: the singleton registry
    returned the stale pre-persist parent, recomputing from host data)."""
    x = rng.standard_normal((8, 8))
    a = da.from_array(x, chunks=4)
    y1 = (a + 1)  # registers Elemwise(FromArray)
    ap = a.persist()
    assert ap.name == a.name  # the user-visible pin holds
    y2 = ap + 1
    assert y2.expr is not y1.expr  # but parents are distinct expressions
    from dask_array_tpu._collection import Persisted

    assert isinstance(y2.expr.dependencies()[0], Persisted)
    np.testing.assert_allclose(y2.compute(), x + 1)


def test_substitute_with_persisted(rng):
    from dask_array_tpu._collection import Array, Persisted
    from dask_array_tpu.ops._from_array import FromArray

    x = rng.standard_normal((8, 8))
    a = da.from_array(x, chunks=4)
    y = (a * 3).sum(axis=0)
    leaf = y.expr.find(FromArray)[0]
    swapped = y.expr.substitute(leaf, Array(leaf).persist().expr)
    assert swapped.find(Persisted), "substitution was lost"
    np.testing.assert_allclose(
        np.asarray(da.new_collection(swapped).compute()), (x * 3).sum(axis=0)
    )


def test_trace_config_changes_do_not_reuse_stale_executables(rng):
    # regression: tpu.* config read at TRACE time is baked into the
    # compiled program; switching it mid-session must not serve the old
    # executable (qr-gram switch silently returned eigh-clamp results
    # after setting "shifted")
    import dask_array_tpu as da
    from dask_array_tpu import config
    from dask_array_tpu._executor import _program_key, collect_leaves

    x = da.from_array(np.arange(24.0).reshape(4, 6), chunks=(2, 3))
    expr = (x + 1).expr
    keys = tuple(k for k, _ in collect_leaves(expr))
    k1 = _program_key(expr, keys, None, False)
    with config.set({"tpu.qr-gram": "eigh-clamp"}):
        k2 = _program_key(expr, keys, None, False)
    k3 = _program_key(expr, keys, None, False)
    assert k1 != k2
    assert k1 == k3  # reverting the config re-hits the original executable
