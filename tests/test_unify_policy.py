"""Cost-aware chunk-unification policy (parity:
/root/reference/bench/bench_unify_policy.py semantics)."""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu import config
from dask_array_tpu._chunks import PerformanceWarning, unify_blockdims
from dask_array_tpu._test_utils import assert_eq


def test_unify_blockdims_policies():
    coarse_layout = (50, 50)
    fine_layout = (25, 25, 25, 25)
    # big operand already coarse, small operand fine -> auto merges
    out = unify_blockdims([(coarse_layout, 1e9), (fine_layout, 1e6)], policy="auto")
    assert out == coarse_layout
    # the fine operand dominates -> merging would move too much: refine
    out2 = unify_blockdims([(coarse_layout, 1e3), (fine_layout, 1e9)], policy="auto")
    assert out2 == fine_layout
    # explicit policies
    assert unify_blockdims([(coarse_layout, 1), (fine_layout, 1)], policy="coarse") == coarse_layout
    assert unify_blockdims([(coarse_layout, 1), (fine_layout, 1)], policy="refine") == fine_layout
    # non-nested layouts refine to the union of boundaries
    out3 = unify_blockdims([((30, 70), 1.0), ((60, 40), 1.0)], policy="refine")
    assert out3 == (30, 30, 40)
    # coarse of non-nested = intersection of boundaries (single chunk here)
    out4 = unify_blockdims([((30, 70), 1e9), ((60, 40), 1.0)], policy="coarse")
    assert out4 == (100,)


def test_unify_limit_warns():
    with pytest.warns(PerformanceWarning):
        out = unify_blockdims(
            [((1000, 1000), 8e9), ((500,) * 4, 1.0)],
            policy="coarse",
            limit_bytes=1000,  # absurdly small: force the refine fallback
            row_bytes=4e6,
        )
    assert out == (500, 500, 500, 500)


def test_elemwise_uses_policy(rng):
    # note: expression metadata is cached per singleton node, so each policy
    # gets fresh operands (config participates at build time, like the
    # reference's lowering cache)
    with config.set({"array.unify-chunks-policy": "coarse"}):
        x = rng.standard_normal((100,))
        out = da.from_array(x, chunks=50) + da.from_array(x.copy(), chunks=25)
        assert out.chunks == ((50, 50),)
        assert_eq(out, 2 * x)
    with config.set({"array.unify-chunks-policy": "refine"}):
        y = rng.standard_normal((100,))
        out = da.from_array(y, chunks=50) + da.from_array(y.copy(), chunks=25)
        assert out.chunks == ((25, 25, 25, 25),)
        assert_eq(out, 2 * y)


def test_elemwise_auto_prefers_backed_layout(rng):
    # the 2-D operand is far bigger; its layout along the shared axis wins
    x = rng.standard_normal((200, 100))
    y = rng.standard_normal((100,))
    dx = da.from_array(x, chunks=(100, 50))
    dy = da.from_array(y, chunks=25)
    out = dx + dy
    assert out.chunks[1] == (50, 50), out.chunks
    assert_eq(out, x + y)
