"""The divergence table's executable half (docs/divergences.md).

Each entry pins BOTH lanes' behavior: the trace lane's documented
divergence and the eager lane's numpy-strict raise (VERDICT r3 #9 —
"make the eager lane raise where numpy raises").
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu import config


def _eager():
    return config.set({"tpu.jit": False})


# -- entry 1: nanarg / arg sentinels ----------------------------------------


def test_nanarg_direct_fetch_raises_both_lanes():
    x = da.from_array(np.full((4,), np.nan), chunks=2)
    with pytest.raises(ValueError, match="All-NaN"):
        da.nanargmax(x).compute()
    with _eager():
        with pytest.raises(ValueError, match="All-NaN"):
            da.nanargmax(x).compute()


def test_arg_empty_raises_both_lanes():
    x = da.from_array(np.empty((0,)), chunks=1)
    with pytest.raises(ValueError, match="empty sequence"):
        da.argmin(x).compute()


_trace_lane_only = pytest.mark.skipif(
    not config.get("tpu.jit", True),
    reason="asserts trace-lane behavior; the eager lane is strict",
)


@_trace_lane_only
def test_nanarg_in_graph_sentinel_trace_raises_eager():
    # trace lane: in-graph consumers keep jax's -1 sentinel (documented)
    x = da.from_array(np.full((4,), np.nan), chunks=2)
    consumer = da.nanargmax(x) + 0
    assert int(consumer.compute()) == -1
    # eager lane: concrete values -> numpy's ValueError even in-graph
    with _eager():
        with pytest.raises(ValueError, match="All-NaN"):
            consumer.compute()


# -- entry 2: data-dependent OOB gathers ------------------------------------


def _oob_lazy_index():
    x = da.from_array(np.arange(10.0), chunks=5)
    # data-dependent index: computed from a lazy array, so its values are
    # unknown at graph build (the host-leaf bounds check cannot see them)
    i = (da.from_array(np.array([2, 5]), chunks=2) * 4).astype("i8")  # [8, 20]
    return x[i]


@_trace_lane_only
def test_oob_gather_clips_on_trace_lane():
    out = np.asarray(_oob_lazy_index().compute())
    # 20 clips to index 9 (documented divergence)
    np.testing.assert_array_equal(out, [8.0, 9.0])


def test_oob_gather_raises_on_eager_lane():
    with _eager():
        with pytest.raises(IndexError, match="out of bounds"):
            _oob_lazy_index().compute()


def test_leaf_known_oob_raises_both_lanes():
    x = da.from_array(np.arange(10.0), chunks=5)
    i = da.from_array(np.array([2, 20]), chunks=2)
    with pytest.raises(IndexError, match="out of bounds"):
        x[i].compute()
    with _eager():
        with pytest.raises(IndexError, match="out of bounds"):
            x[i].compute()


def test_in_bounds_gather_identical_both_lanes():
    x = da.from_array(np.arange(10.0), chunks=5)
    i = (da.from_array(np.array([1, 2]), chunks=2) * 3).astype("i8")
    want = np.arange(10.0)[[3, 6]]
    np.testing.assert_array_equal(np.asarray(x[i].compute()), want)
    with _eager():
        np.testing.assert_array_equal(np.asarray(x[i].compute()), want)


def test_negative_in_bounds_wraps_both_lanes():
    x = da.from_array(np.arange(10.0), chunks=5)
    i = (da.from_array(np.array([1, 2]), chunks=2) - 3).astype("i8")  # [-2, -1]
    want = np.arange(10.0)[[-2, -1]]
    np.testing.assert_array_equal(np.asarray(x[i].compute()), want)
    with _eager():
        np.testing.assert_array_equal(np.asarray(x[i].compute()), want)
