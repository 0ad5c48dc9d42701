"""execute() repeat-call fast path (the single-root _em_fastpath analog).

A steady serving loop re-executing the SAME root object skips the
traceable walk / leaf collection / program-key build; the memo dies with
the root (weakref finalize) so recycled ids can never alias, and config
changes (donation, jit, execution lane, trace-affecting keys) bypass it.
"""

import gc

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu import config
from dask_array_tpu import _executor as EX

# the memo only populates on the COMPILED path; the eager lane never uses it
pytestmark = pytest.mark.skipif(
    not config.get("tpu.jit", True), reason="eager lane: compiled path off"
)


def test_fastpath_hits_and_matches():
    src = np.random.default_rng(0).standard_normal((64, 64))
    x = da.from_array(src, chunks=32)
    out = (x * 2 + 1).sum(axis=0)
    lowered = out.expr.optimize()
    first = np.asarray(EX.execute(lowered))
    key = (id(lowered), EX._mesh_key(None), EX._trace_config_key())
    assert key in EX._ex_fastpath
    second = np.asarray(EX.execute(lowered))
    np.testing.assert_allclose(first, second)
    np.testing.assert_allclose(first, (src * 2 + 1).sum(axis=0))


def test_fastpath_entry_dies_with_root():
    src = np.random.default_rng(1).standard_normal((32, 32))
    x = da.from_array(src, chunks=16)
    lowered = (x + 5).expr.optimize()
    _ = EX.execute(lowered)
    key = (id(lowered), EX._mesh_key(None), EX._trace_config_key())
    assert key in EX._ex_fastpath
    del lowered, x
    gc.collect()
    assert key not in EX._ex_fastpath  # finalize evicted it


def test_fastpath_respects_config_changes():
    src = np.random.default_rng(2).standard_normal((32, 32))
    x = da.from_array(src, chunks=16)
    lowered = (x - 1).expr.optimize()
    _ = EX.execute(lowered)
    # a trace-affecting config change misses the memo (different key)
    with config.set({"tpu.matmul-precision": "highest"}):
        out = np.asarray(EX.execute(lowered))
    np.testing.assert_allclose(out, src - 1)
    # eager lane never uses it
    with config.set({"tpu.jit": False}):
        out = np.asarray(EX.execute(lowered))
    np.testing.assert_allclose(out, src - 1)


def test_fastpath_want_view():
    src = np.random.default_rng(3).standard_normal((32, 32))
    x = da.from_array(src, chunks=16)
    lowered = (x * 3).expr.optimize()
    _ = EX.execute(lowered)  # populate
    view = EX.execute(lowered, want_view=True)  # hit, view form
    np.testing.assert_allclose(np.asarray(view.dense()), src * 3)
    np.testing.assert_allclose(np.asarray(view.block((0, 0))), src[:16, :16] * 3)
