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


_STARTS = [
    ((24, 18), (7, 5)),
    ((24, 18), (24, 3)),
    ((30,), 7),
    ((8, 6, 5), (3, 2, 5)),
    ((13, 11), (13, 11)),
]


def _start(which=0):
    shape, chunks = _STARTS[which % len(_STARTS)]
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
                    "sqrt_abs",
                    "maximum_const",
                    "cumsum0",
                    "max0",
                    "broadcast_add",
                    "concat_self",
                    "pad_edge",
                    "roll1",
                    "astype32",
                    "overlap_identity",
                    "ravel",
                    "stack_unstack",
                    "clip",
                    "where_pos",
                    "diff0",
                    "reshape_split",
                    "reshape_merge",
                    "sliding_reduce",
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
    if op == "sqrt_abs":
        return da.sqrt(abs(d)), np.sqrt(np.abs(x))
    if op == "maximum_const":
        return da.maximum(d, 10.0), np.maximum(x, 10.0)
    if op == "cumsum0" and d.ndim >= 1 and not _nan(d.shape[0]):
        return d.cumsum(axis=0), np.cumsum(x, axis=0)
    if op == "max0" and d.ndim >= 2:
        return d.max(axis=0), x.max(axis=0)
    if op == "broadcast_add" and d.ndim >= 1 and not any(_nan(s) for s in d.shape):
        v = np.arange(d.shape[-1], dtype="f8")
        return d + da.from_array(v, chunks=max(1, d.shape[-1] // 2)), x + v
    if op == "concat_self" and d.ndim >= 1 and not any(_nan(s) for s in d.shape):
        return da.concatenate([d, d], axis=0), np.concatenate([x, x], axis=0)
    if op == "pad_edge" and d.ndim >= 1 and not any(_nan(s) for s in d.shape):
        pw = [(1, 2)] + [(0, 0)] * (d.ndim - 1)
        return da.pad(d, pw, mode="edge"), np.pad(x, pw, mode="edge")
    if op == "roll1" and d.ndim >= 1 and not any(_nan(s) for s in d.shape):
        return da.roll(d, 2, axis=0), np.roll(x, 2, axis=0)
    if op == "astype32":
        return d.astype("f4").astype("f8"), x.astype("f4").astype("f8")
    if op == "overlap_identity" and d.ndim >= 1 and not any(_nan(s) for s in d.shape) and d.shape[0] >= 4:
        return (
            da.map_overlap(lambda b: b, d, depth={0: 1}, boundary="reflect", dtype=x.dtype),
            x,
        )
    if op == "ravel" and not any(_nan(s) for s in d.shape):
        return d.ravel(), x.ravel()
    if op == "stack_unstack" and d.ndim >= 1 and not any(_nan(s) for s in d.shape):
        return da.stack([d, d], axis=0)[1], x
    if op == "clip":
        return da.clip(d, 5.0, 200.0), np.clip(x, 5.0, 200.0)
    if op == "where_pos":
        return da.where(d > 50, d, 0.0), np.where(x > 50, x, 0.0)
    if op == "diff0" and d.ndim >= 1 and not any(_nan(s) for s in d.shape) and d.shape[0] > 1:
        return da.diff(d, axis=0), np.diff(x, axis=0)
    if (
        op == "reshape_split"
        and d.ndim >= 2
        and not any(_nan(s) for s in d.shape)
        and d.shape[-1] % 2 == 0
    ):
        new = tuple(d.shape[:-1]) + (2, d.shape[-1] // 2)
        return d.reshape(new), x.reshape(new)
    if op == "reshape_merge" and d.ndim >= 3 and not any(_nan(s) for s in d.shape):
        new = tuple(d.shape[:-2]) + (d.shape[-2] * d.shape[-1],)
        return d.reshape(new), x.reshape(new)
    if (
        op == "sliding_reduce"
        and d.ndim >= 1
        and not any(_nan(s) for s in d.shape)
        and d.shape[0] >= 4
    ):
        # reduce_window fusion: the window dim must never materialize
        w = int(rng.integers(2, min(5, d.shape[0])))
        red = ["sum", "max", "mean"][int(rng.integers(0, 3))]
        return (
            getattr(da, red)(da.sliding_window_view(d, w, axis=0), axis=-1),
            getattr(np, red)(np.lib.stride_tricks.sliding_window_view(x, w, axis=0), axis=-1),
        )
    return d, x


def _nan(v):
    return isinstance(v, float) and np.isnan(v)


@settings(max_examples=int(__import__("os").environ.get("DA_FUZZ_EXAMPLES", 80)), deadline=None)
@given(ops=op_chain(), seed=st.integers(0, 2**31 - 1), start=st.integers(0, 4))
def test_fuzz_chain_matches_numpy(ops, seed, start):
    rng = np.random.default_rng(seed)
    d, x = _start(start)
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


@settings(max_examples=int(__import__("os").environ.get("DA_FUZZ_EXAMPLES_DEEP", 15)), deadline=None)
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
