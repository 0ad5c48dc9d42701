"""Optimizer pushdown structure tests (the reference's per-rewrite test
files: test_rechunk_pushdown.py, test_slice_through_blockwise.py,
test_shuffle_chunks.py — condensed)."""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._rechunk import Rechunk
from dask_array_tpu._shuffle import Shuffle
from dask_array_tpu._slicing import Slice
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.ops._from_array import FromArray
from dask_array_tpu.ops.creation import BroadcastTrick
from dask_array_tpu.ops.manipulation import Transpose


def types_of(expr):
    return [type(n).__name__ for n in expr.walk()]


def test_rechunk_through_elemwise(rng):
    x = rng.standard_normal((40, 40))
    d = da.from_array(x, chunks=10)
    y = (d + 1).rechunk(20)
    opt = y.expr.simplify()
    # the rechunk was pushed below the add and absorbed by the FromArray leaf
    assert "Rechunk" not in types_of(opt), opt.tree_repr()
    leaves = [n for n in opt.walk() if isinstance(n, FromArray)]
    assert leaves and leaves[0].chunks == ((20, 20), (20, 20))
    assert_eq(y, x + 1)


def test_rechunk_through_transpose(rng):
    x = rng.standard_normal((30, 20))
    d = da.from_array(x, chunks=10)
    y = d.T.rechunk((20, 15))
    opt = y.expr.simplify()
    assert "Rechunk" not in types_of(opt), opt.tree_repr()
    leaves = [n for n in opt.walk() if isinstance(n, FromArray)]
    assert leaves and leaves[0].chunks == ((15, 15), (20,)), leaves[0].chunks
    assert_eq(y, x.T)


def test_rechunk_shared_dependent_declines(rng):
    x = rng.standard_normal((20,))
    d = da.from_array(x, chunks=5) + 1
    r = d.rechunk(10)
    other = d * 2  # second consumer of the elemwise
    total = (r.expr, other.expr)
    # simplifying r alone pushes; but in a tree where d has another dependent
    # the gate declines
    combined = (r + other.rechunk(10)).expr.simplify()
    # correctness either way:
    assert_eq(r + other.rechunk(10), (x + 1) + (x + 1) * 2)


def test_slice_through_shuffle(rng):
    x = rng.standard_normal((12, 10))
    d = da.from_array(x, chunks=(4, 5))
    sh = d.shuffle([[3, 1], [0, 2], [7, 5, 4]], axis=0)
    y = sh[:, 2:8]
    opt = y.expr.simplify()
    assert isinstance(opt, Shuffle), opt.tree_repr()
    flat = [3, 1, 0, 2, 7, 5, 4]
    assert_eq(y, x[flat][:, 2:8])


def test_coarse_slice_through_map_blocks(rng):
    import jax.numpy as jnp

    x = rng.standard_normal((40, 12))
    d = da.from_array(x, chunks=(10, 6))
    m = d.map_blocks(lambda b: b * 3, dtype=x.dtype)
    y = m[10:30]  # block-aligned slice
    opt = y.expr.simplify()
    assert "Slice" not in types_of(opt) or not isinstance(opt, Slice), opt.tree_repr()
    leaves = [n for n in opt.walk() if isinstance(n, FromArray)]
    assert leaves and leaves[0].chunks[0] == (10, 10), opt.tree_repr()
    assert_eq(y, x[10:30] * 3)


def test_unaligned_slice_stays_outside_map_blocks(rng):
    x = rng.standard_normal((40, 12))
    d = da.from_array(x, chunks=(10, 6))
    m = d.map_blocks(lambda b: b * 3, dtype=x.dtype)
    y = m[7:29]  # NOT block-aligned: must not push into the per-block fn
    opt = y.expr.simplify()
    assert isinstance(opt, Slice), opt.tree_repr()
    assert_eq(y, x[7:29] * 3)


def test_rechunk_through_squeeze(rng):
    x = rng.standard_normal((1, 30))
    d = da.from_array(x, chunks=(1, 10))
    y = d.squeeze(0).rechunk(15)
    opt = y.expr.simplify()
    assert "Rechunk" not in types_of(opt), opt.tree_repr()
    assert_eq(y, x.squeeze(0))


def test_shuffle_pushdown_into_constant():
    x = da.ones((12,), chunks=4)
    sh = x.shuffle([[5, 1, 0], [2, 3, 4]], axis=0)  # groups too big to merge
    opt = sh.expr.simplify()
    assert isinstance(opt, BroadcastTrick), opt.tree_repr()
    assert opt.chunks == ((3, 3),)
    assert_eq(sh, np.ones(6))


def test_slice_through_einsum(rng):
    from dask_array_tpu.ops.linalg import Einsum, einsum

    x = rng.standard_normal((12, 10))
    y = rng.standard_normal((10, 8))
    dx, dy = da.from_array(x, chunks=4), da.from_array(y, chunks=4)
    out = einsum("ij,jk->ik", dx, dy)[2:7, 1:5]
    opt = out.expr.simplify()
    assert isinstance(opt, Einsum), opt.tree_repr()
    # the contraction now reads only the needed rows/cols
    assert opt.shape == (5, 4)
    assert_eq(out, np.einsum("ij,jk->ik", x, y)[2:7, 1:5], rtol=1e-10)


def test_slice_through_matmul(rng):
    x = rng.standard_normal((20, 16))
    d = da.from_array(x, chunks=5)
    out = (d @ d.T)[:6]
    opt = out.expr.simplify()
    from dask_array_tpu.ops.linalg import Einsum

    assert isinstance(opt, Einsum), opt.tree_repr()
    assert_eq(out, (x @ x.T)[:6], rtol=1e-10)


def test_reduction_int_slice_pushdown():
    x = da.ones((100, 100), chunks=10)
    y = x.sum(axis=1)[7]
    opt = y.expr.simplify()
    leaves = [n for n in opt.walk() if isinstance(n, BroadcastTrick)]
    assert leaves and leaves[0].shape == (1, 100), opt.tree_repr()
    assert float(y.compute()) == 100.0


def test_slice_through_overlap_non_halo_axis(rng):
    from dask_array_tpu.ops._overlap import Overlap

    x = rng.standard_normal((16, 12))
    d = da.from_array(x, chunks=4)
    g = da.overlap(d, depth={0: 1}, boundary="reflect")
    y = g[:, 2:9]
    opt = y.expr.simplify()
    assert isinstance(opt, Overlap), opt.tree_repr()
    # slice on the halo axis does NOT push
    y2 = g[3:7]
    assert not isinstance(y2.expr.simplify(), Overlap)
