import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.ops._sliding import (
    SlidingWindowReduce,
    move_max,
    move_mean,
    move_min,
    move_std,
    move_sum,
    move_var,
)


def test_sliding_reduce_fusion(rng):
    x = rng.standard_normal((40,))
    d = da.from_array(x, chunks=10)
    w = da.sliding_window_view(d, 7)
    out = w.sum(axis=-1)
    opt = out.expr.simplify()
    nodes = [type(n).__name__ for n in opt.walk()]
    assert "SlidingWindowReduce" in nodes, nodes
    expected = np.lib.stride_tricks.sliding_window_view(x, 7).sum(axis=-1)
    assert_eq(out, expected, check_chunks=False, rtol=1e-10)
    # mean / max also fuse
    for kind, npfn in [("mean", np.mean), ("max", np.max), ("min", np.min)]:
        o = getattr(w, kind)(axis=-1)
        assert "SlidingWindowReduce" in [type(n).__name__ for n in o.expr.simplify().walk()]
        assert_eq(o, npfn(np.lib.stride_tricks.sliding_window_view(x, 7), axis=-1), check_chunks=False, rtol=1e-10)


def test_sliding_reduce_2d_axis(rng):
    x = rng.standard_normal((6, 30))
    d = da.from_array(x, chunks=(3, 10))
    w = da.sliding_window_view(d, (5,), axis=(1,))
    out = w.sum(axis=-1)
    expected = np.lib.stride_tricks.sliding_window_view(x, (5,), axis=(1,)).sum(axis=-1)
    assert_eq(out, expected, check_chunks=False, rtol=1e-10)


def test_move_sum_mean(rng):
    x = rng.standard_normal((30,))
    d = da.from_array(x, chunks=8)
    out = move_sum(d, 5).compute()
    expected = np.full(30, np.nan)
    for i in range(4, 30):
        expected[i] = x[i - 4 : i + 1].sum()
    np.testing.assert_allclose(out, expected, rtol=1e-10)
    out_mc = move_sum(d, 5, min_count=1).compute()
    for i in range(4):
        expected[i] = x[: i + 1].sum()
    np.testing.assert_allclose(out_mc, expected, rtol=1e-10)
    m = move_mean(d, 4).compute()
    for i in range(3, 30):
        assert abs(m[i] - x[i - 3 : i + 1].mean()) < 1e-10
    assert np.isnan(m[:3]).all()


def test_move_nan_handling():
    x = np.array([1.0, np.nan, 3.0, 4.0, 5.0, np.nan])
    d = da.from_array(x, chunks=3)
    out = move_sum(d, 3, min_count=2).compute()
    # window [1, nan, 3] has 2 valid -> 4
    assert out[2] == 4.0
    assert out[3] == 7.0  # [nan,3,4]
    assert out[4] == 12.0
    assert out[5] == 9.0  # [4,5,nan]
    assert np.isnan(out[0])  # only 1 valid
    mx = move_max(d, 3, min_count=1).compute()
    assert mx[1] == 1.0 and mx[4] == 5.0


def test_move_var_std(rng):
    x = rng.standard_normal((25,))
    d = da.from_array(x, chunks=7)
    v = move_var(d, 6).compute()
    s = move_std(d, 6).compute()
    for i in range(5, 25):
        w = x[i - 5 : i + 1]
        assert abs(v[i] - w.var()) < 1e-8
        assert abs(s[i] - w.std()) < 1e-8
    assert np.isnan(v[:5]).all()


def test_move_2d_axis(rng):
    x = rng.standard_normal((4, 20))
    d = da.from_array(x, chunks=(2, 5))
    out = move_min(d, 4, axis=1).compute()
    for i in range(3, 20):
        np.testing.assert_allclose(out[:, i], x[:, i - 3 : i + 1].min(axis=1))
    assert np.isnan(out[:, :3]).all()


def test_sliding_var_large_mean_stability(rng):
    # shifted power sums: E[x^2]-E[x]^2 in f32 loses everything when
    # |mean| >> std; the fused path must survive mean=1e4, std~1.
    x = (rng.standard_normal(64) + 1e4).astype(np.float32)
    d = da.from_array(x, chunks=16)
    w = da.sliding_window_view(d, 9)
    # var decomposes to shifted power sums; the elemwise-through-window
    # pushdown re-fuses the power-sum windows, so this exercises both the
    # decomposed lane's stability AND the fused reduce_window path
    v = w.var(axis=-1)
    expected = np.lib.stride_tricks.sliding_window_view(x.astype(np.float64), 9).var(axis=-1)
    np.testing.assert_allclose(np.asarray(v.compute(), dtype=np.float64), expected, rtol=1e-2)
    s = w.std(axis=-1)
    np.testing.assert_allclose(
        np.asarray(s.compute(), dtype=np.float64), np.sqrt(expected), rtol=1e-2
    )


def test_move_var_large_mean_stability(rng):
    x = (rng.standard_normal(40) + 1e4).astype(np.float32)
    d = da.from_array(x, chunks=10)
    v = np.asarray(move_var(d, 8).compute(), dtype=np.float64)
    xs = x.astype(np.float64)
    for i in range(7, 40):
        w = xs[i - 7 : i + 1]
        assert abs(v[i] - w.var()) < 1e-2 * max(w.var(), 1e-6), (i, v[i], w.var())
