"""Property-based fuzzing of the optimizer (parity:
/root/reference/dask_array/tests/test_fuzz_optimize.py).

Random op chains over an arange-based array (distinct values, so any
index-mapping bug changes values) with a numpy mirror; the optimized
compute must match numpy exactly.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import dask_array_tpu as da


def _start(shape=(24, 18), chunks=(7, 5)):
    x = np.arange(np.prod(shape), dtype="f8").reshape(shape)
    return da.from_array(x, chunks=chunks), x


@st.composite
def op_chain(draw):
    return draw(
        st.lists(
            st.sampled_from(
                [
                    "slice_rows",
                    "slice_cols",
                    "slice_step",
                    "transpose",
                    "add_const",
                    "mul",
                    "rechunk",
                    "sum0",
                    "mean1",
                    "neg",
                    "flip",
                    "expand_squeeze",
                ]
            ),
            min_size=1,
            max_size=6,
        )
    )


def _apply(op, d, x, rng):
    if op == "slice_rows" and d.ndim >= 1 and not _nan(d.shape[0]) and d.shape[0] > 2:
        k = d.shape[0]
        a, b = sorted(rng.integers(0, k, 2).tolist())
        b = max(b, a + 1)
        return d[a:b], x[a:b]
    if op == "slice_cols" and d.ndim >= 2 and d.shape[1] > 2:
        k = d.shape[1]
        a, b = sorted(rng.integers(0, k, 2).tolist())
        b = max(b, a + 1)
        return d[:, a:b], x[:, a:b]
    if op == "slice_step" and d.ndim >= 1 and d.shape[0] > 3:
        s = int(rng.integers(2, 4))
        return d[::s], x[::s]
    if op == "transpose" and d.ndim == 2:
        return d.T, x.T
    if op == "add_const":
        return d + 3.5, x + 3.5
    if op == "mul":
        return d * d, x * x
    if op == "rechunk" and d.ndim >= 1 and not _nan(d.shape[0]):
        new = tuple(max(1, s // 3) for s in d.shape)
        return d.rechunk(new), x
    if op == "sum0" and d.ndim >= 2:
        return d.sum(axis=0), x.sum(axis=0)
    if op == "mean1" and d.ndim >= 2:
        return d.mean(axis=1), x.mean(axis=1)
    if op == "neg":
        return -d, -x
    if op == "flip" and d.ndim >= 1:
        return d[::-1], x[::-1]
    if op == "expand_squeeze":
        return da.expand_dims(d, 0).squeeze(0), x
    return d, x


def _nan(v):
    return isinstance(v, float) and np.isnan(v)


@settings(max_examples=40, deadline=None)
@given(ops=op_chain(), seed=st.integers(0, 2**31 - 1))
def test_fuzz_chain_matches_numpy(ops, seed):
    rng = np.random.default_rng(seed)
    d, x = _start()
    for op in ops:
        d, x = _apply(op, d, x, rng)
    got = d.compute()
    np.testing.assert_allclose(np.asarray(got), x, rtol=1e-12, atol=1e-12)
    # metadata must agree with the computed result
    assert np.asarray(got).shape == tuple(int(s) for s in d.shape)
    # simplification is idempotent (fixpoint reached)
    s1 = d.expr.simplify()
    s2 = s1.simplify()
    assert s1._name == s2._name


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(5, 60),
    c1=st.integers(1, 20),
    c2=st.integers(1, 20),
    a=st.integers(0, 59),
    b=st.integers(0, 59),
    step=st.integers(1, 5),
)
def test_fuzz_slice_chunks_sum_to_shape(n, c1, c2, a, b, step):
    x = np.arange(n, dtype="f8")
    d = da.from_array(x, chunks=min(c1, n))
    sl = slice(min(a, b), max(a, b) + 1, step)
    y = d[sl].rechunk(min(c2, max(1, len(x[sl]) or 1)))
    got = y.compute()
    np.testing.assert_array_equal(got, x[sl])
    assert sum(y.chunks[0]) == len(x[sl])
