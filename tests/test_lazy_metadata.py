"""Naming and construction stay cheap: no metadata inference at build time.

Reference: ``tests/test_lazy_metadata.py`` — constructing an Elemwise must
not run dtype inference, broadcasting, or chunk unification (every rewrite
mints fresh nodes, so eager metadata multiplies across an optimize pass).
A cached_property lands in ``vars(expr)`` only once actually computed.
"""

from __future__ import annotations

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._blockwise import Elemwise

_META = {"_info", "out_ind", "chunks", "shape", "_meta", "dtype", "ndim", "_index_chunks"}


def _cached(expr):
    return {k for k in vars(expr) if k in _META}


def test_constructing_elemwise_does_not_infer_metadata():
    x = da.ones((512, 512), chunks=(64, 64))
    y = da.ones((512, 512), chunks=(64, 64))
    expr = (x + y).expr
    assert isinstance(expr, Elemwise)
    assert _cached(expr) == set()


def test_elemwise_dtype_does_not_compute_chunks():
    x = da.ones((512, 512), chunks=(64, 64))
    y = da.ones((512, 512), chunks=(64, 64))
    expr = (x * 2 + y).expr
    assert expr.dtype == np.float64
    assert "chunks" not in vars(expr)


def test_broadcast_error_still_raises_at_call(rng=None):
    with pytest.raises(ValueError, match="broadcast"):
        da.ones((6, 8)) + da.ones((5,))
    with pytest.raises(ValueError, match="broadcast"):
        da.ones((3, 4)) * da.ones((3, 5))
    # compatible broadcasts still construct fine
    out = da.ones((6, 8)) + da.ones((8,))
    assert out.shape == (6, 8)


def test_chain_construction_speed():
    # 200-op chain builds without touching chunk metadata per node
    x = da.ones((256, 256), chunks=(32, 32))
    e = x
    for _ in range(200):
        e = e + 1
    assert _cached(e.expr) == set()
    assert float(e[:1, :1].compute()) == 201.0
