"""Transfer-byte cost-model pins (parity: the reference's test_transfer.py:
elemwise free, overlap = ghost cells, rechunk bounded by nbytes)."""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


def test_elemwise_and_slice_free():
    x = da.ones((100, 100), chunks=10)
    assert (x + 1).expr.transfer_bytes() == (0, 0)
    assert x[:50].expr.transfer_bytes() == (0, 0)


def test_rechunk_bounds():
    x = da.from_array(np.ones((100, 100)), chunks=10)
    r = x.rechunk(50)
    lo, hi = r.expr.transfer_bytes()
    assert hi == 100 * 100 * 8  # at most the whole array crosses the boundary
    assert 0 <= lo <= hi
    # no-op rechunk costs nothing after simplification
    assert x.rechunk(10).expr.transfer_bytes() == (0, 0)


def test_overlap_halo_bytes():
    x = da.ones((100, 100), chunks=50)  # 2x2 grid, depth 1
    g = da.overlap(x, depth=1, boundary="none")
    lo, hi = g.expr.transfer_bytes()
    # per axis: (1+1) halo rows x (nblocks-1 seams=1) x other-extent 100 x 8B
    expected = 2 * (2 * 1 * 100 * 8)
    assert lo == hi == expected, (lo, hi, expected)


def test_shuffle_bytes():
    x = da.from_array(np.ones(100), chunks=10)
    sh = x.shuffle([list(range(50)), list(range(50, 100))], axis=0)
    lo, hi = sh.expr.transfer_bytes()
    assert hi == 100 * 8
    assert lo == 0


def test_explain_totals_include_movement():
    x = da.from_array(np.ones((40, 40)), chunks=10)
    y = da.overlap(x.rechunk(20), depth=1, boundary="none")
    import io

    buf = io.StringIO()
    info = da.explain(y, file=buf)
    lo, hi = info["transfer_bytes"]
    assert hi > 0


def test_map_blocks_multi_output(rng):
    import jax.numpy as jnp

    from dask_array_tpu.ops._map_blocks import map_blocks_multi_output

    x = rng.standard_normal((8, 8))
    d = da.from_array(x, chunks=4)
    calls = []

    def stats(b):
        return (b * 2, b + 1)

    twice, plus = map_blocks_multi_output(stats, d, dtypes=(x.dtype, x.dtype))
    assert_eq(twice, x * 2)
    assert_eq(plus, x + 1)
    # both outputs in one compute share the inner node
    s = (twice + plus).compute()
    np.testing.assert_allclose(s, x * 2 + x + 1)


def test_chunks_freeze_blocks_pushdown():
    x = da.ones((100,), chunks=10)
    frozen = (x + 1).freeze_chunks()
    y = frozen[:20]
    opt = y.expr.simplify()
    from dask_array_tpu._slicing import Slice

    assert isinstance(opt, Slice), opt.tree_repr()  # pushdown stopped
    assert_eq(y, np.full(20, 2.0))


def test_shuffle_through_elemwise(rng):
    x = rng.standard_normal((12,))
    d = da.from_array(x, chunks=4) * 2.0
    sh = d.shuffle([[5, 1, 0], [2, 3, 4], [7, 6, 8], [9, 10, 11]], axis=0)
    opt = sh.expr.simplify()
    from dask_array_tpu._blockwise import Elemwise

    assert isinstance(opt, Elemwise), opt.tree_repr()  # shuffle pushed below
    flat = [5, 1, 0, 2, 3, 4, 7, 6, 8, 9, 10, 11]
    assert_eq(sh, x[flat] * 2.0)
