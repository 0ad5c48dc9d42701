"""Reorder (Take/Shuffle) pushdown battery.

Round 3: Take (``x[[1,3,5]]``) joins Shuffle in the reorder-pushdown
protocol (``ArrayExpr._shuffle_pushdown`` + ``._rebase``), porting the
CASES of the reference's shuffle-pushdown family
(``tests/test_slice_pushdown.py:730-1010``): through elemwise (with
broadcast rules), transpose, concatenate, stack, generic blockwise
(declining on adjust_chunks/block-coordinate funcs), creation absorption,
identity/composition simplification, and the shared-node gate.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._blockwise import Elemwise
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.ops._fancy_indexing import Take
from dask_array_tpu.ops._map_blocks import MapBlocks


@pytest.fixture
def rng():
    return np.random.default_rng(47)


def simp_eq(a, b):
    return a.expr.simplify()._name == b.expr.simplify()._name


# -- through elemwise -------------------------------------------------------


def test_take_pushes_through_elemwise_add():
    x = da.arange(20, chunks=5)
    y = da.arange(20, chunks=5)
    idx = [1, 3, 5, 7, 9]
    assert simp_eq((x + y)[idx], x[idx] + y[idx])
    assert_eq((x + y)[idx], (np.arange(20) * 2)[idx])


def test_take_pushes_through_elemwise_mul():
    x = da.arange(30, chunks=10)
    y = da.arange(30, chunks=10)
    idx = [2, 4, 6, 8]
    assert simp_eq((x * y)[idx], x[idx] * y[idx])
    assert_eq((x * y)[idx], (np.arange(30) ** 2)[idx])


def test_take_pushes_through_elemwise_2d():
    x = da.ones((10, 8), chunks=(5, 4))
    y = da.ones((10, 8), chunks=(5, 4))
    idx = [0, 2, 4, 6]
    assert simp_eq((x + y)[idx, :], x[idx, :] + y[idx, :])
    assert_eq((x + y)[idx, :], np.full((4, 8), 2.0))


def test_take_pushes_through_elemwise_scalar():
    x = da.arange(20, chunks=5)
    idx = [1, 5, 9, 13]
    assert simp_eq((x + 1)[idx], x[idx] + 1)
    assert_eq((x + 1)[idx], (np.arange(20) + 1)[idx])


def test_take_pushes_through_unary_elemwise():
    x = da.arange(20, chunks=5)
    idx = [2, 4, 6, 8]
    assert simp_eq((-x)[idx], -(x[idx]))
    assert_eq((-x)[idx], -(np.arange(20)[idx]))


def test_take_through_elemwise_with_broadcast_2d(rng):
    a = da.from_array(np.arange(200).reshape(10, 20), chunks=(4, 5))
    y2d = da.from_array(np.arange(20).reshape(1, 20), chunks=(1, 20))
    assert simp_eq((a * y2d)[[5]], a[[5]] * y2d)
    an = np.arange(200).reshape(10, 20)
    assert_eq((a * y2d)[[5]], (an * np.arange(20).reshape(1, 20))[[5]])


def test_take_through_elemwise_with_broadcast_1d(rng):
    a = da.from_array(np.arange(200).reshape(10, 20), chunks=(4, 5))
    y1d = da.from_array(np.arange(20), chunks=20)
    assert simp_eq((a * y1d)[[5]], a[[5]] * y1d)
    an = np.arange(200).reshape(10, 20)
    assert_eq((a * y1d)[[5]], (an * np.arange(20))[[5]])


def test_take_not_dropped_when_all_elemwise_inputs_broadcast():
    # reference :986 — every input broadcasts on the take axis: the take
    # must stay (it GROWS the size-1 axis)
    x = da.from_array(np.array([7.0]), chunks=(1,))
    y = (-x)[[0, 0]]
    assert y.expr.optimize().shape == (2,)
    assert_eq(y, np.array([-7.0, -7.0]))


def test_take_not_dropped_on_broadcast_dim():
    b = da.broadcast_to(da.from_array(np.array([5.0]), chunks=(1,)), (100,))
    y = b[[3, 97, 42]]
    assert y.expr.optimize().shape == (3,)
    assert_eq(y, np.array([5.0, 5.0, 5.0]))


# -- through transpose ------------------------------------------------------


def test_take_pushes_through_transpose():
    x = da.arange(20, chunks=5).reshape((4, 5))
    assert simp_eq(x.T[[1, 3], :], x[:, [1, 3]].T)
    assert_eq(x.T[[1, 3], :], np.arange(20).reshape(4, 5).T[[1, 3], :])


def test_take_pushes_through_transpose_axis1():
    x = da.arange(20, chunks=5).reshape((4, 5))
    assert simp_eq(x.T[:, [0, 2]], x[[0, 2], :].T)
    assert_eq(x.T[:, [0, 2]], np.arange(20).reshape(4, 5).T[:, [0, 2]])


def test_take_pushes_through_transpose_3d():
    x = da.ones((2, 3, 4), chunks=2)
    r = x.transpose((2, 1, 0))[[0, 2], :, :]
    e = x[:, :, [0, 2]].transpose((2, 1, 0))
    assert simp_eq(r, e)
    assert_eq(r, np.ones((2, 3, 4)).transpose(2, 1, 0)[[0, 2]])


# -- through concatenate / stack --------------------------------------------


def test_take_pushes_through_concatenate():
    a = da.arange(20, chunks=5).reshape((4, 5))
    b = da.arange(20, 40, chunks=5).reshape((4, 5))
    r = da.concatenate([a, b], axis=1)[[0, 2], :]
    e = da.concatenate([a[[0, 2], :], b[[0, 2], :]], axis=1)
    assert simp_eq(r, e)
    an, bn = np.arange(20).reshape(4, 5), np.arange(20, 40).reshape(4, 5)
    assert_eq(r, np.concatenate([an, bn], axis=1)[[0, 2], :])


def test_take_on_concat_axis_stays_above():
    a = da.arange(20, chunks=5).reshape((4, 5))
    b = da.arange(20, 40, chunks=5).reshape((4, 5))
    c = da.concatenate([a, b], axis=0)  # (8, 5)
    r = c[[1, 6, 3], :]  # spans both parts: stays above
    an, bn = np.arange(20).reshape(4, 5), np.arange(20, 40).reshape(4, 5)
    assert_eq(r, np.concatenate([an, bn], axis=0)[[1, 6, 3], :])


def test_take_pushes_through_stack():
    a = da.arange(12, chunks=4).reshape((3, 4))
    b = da.arange(12, 24, chunks=4).reshape((3, 4))
    r = da.stack([a, b], axis=0)[:, [0, 2], :]
    e = da.stack([a[[0, 2], :], b[[0, 2], :]], axis=0)
    assert simp_eq(r, e)
    an, bn = np.arange(12).reshape(3, 4), np.arange(12, 24).reshape(3, 4)
    assert_eq(r, np.stack([an, bn])[:, [0, 2], :])


def test_take_on_stack_axis_stays_above():
    a = da.arange(12, chunks=4).reshape((3, 4))
    b = da.arange(12, 24, chunks=4).reshape((3, 4))
    st = da.stack([a, b], axis=0)
    an, bn = np.arange(12).reshape(3, 4), np.arange(12, 24).reshape(3, 4)
    assert_eq(st[[1, 0, 1], :, :], np.stack([an, bn])[[1, 0, 1]])


# -- through generic blockwise (map_blocks) ---------------------------------


def test_take_pushes_through_map_blocks():
    x = da.ones((4, 6), chunks=(2, 3))
    r = x.map_blocks(lambda b: b * 2)[[0, 2], :]
    opt = r.expr.simplify()
    assert isinstance(opt, MapBlocks)
    assert_eq(r, np.full((2, 6), 2.0))


def test_take_does_not_push_through_adjust_chunks():
    x = da.ones((8, 6), chunks=(2, 3))
    m = x.map_blocks(lambda b: b[:1] * 2, chunks=(1, 3))
    r = m[[0, 2], :]
    assert isinstance(r.expr.simplify(), Take)
    assert_eq(r, np.full((2, 6), 2.0))


def test_take_does_not_push_under_block_id():
    x = da.ones((8, 6), chunks=(2, 3))

    def f(b, block_id=None):
        return b + block_id[0]

    m = x.map_blocks(f, dtype="f8")
    r = m[[0, 7], :]
    want = np.ones((8, 6)) + np.repeat(np.arange(4), 2)[:, None]
    assert_eq(r, want[[0, 7], :])


# -- shared nodes / gates ---------------------------------------------------


def test_take_not_pushed_into_shared_node():
    # reference :965 — pushing would duplicate the shared chain's work
    x = da.from_array(np.arange(10000.0).reshape(100, 100), chunks=(10, 10))
    y = (x + 1) * 2
    z = y[[5, 3, 1]].sum() + y.sum()
    simplified = z.expr.simplify()
    n_elem = sum(1 for n in simplified.walk() if isinstance(n, Elemwise))
    assert n_elem == 3  # add + mul shared, plus the top-level add
    xn = np.arange(10000.0).reshape(100, 100)
    yn = (xn + 1) * 2
    assert_eq(z, yn[[5, 3, 1]].sum() + yn.sum())


# -- simplification ---------------------------------------------------------


def test_identity_take_disappears():
    t = da.from_array(np.arange(10.0), chunks=5)
    ti = t[np.arange(10)]
    assert type(ti.expr.simplify()).__name__ == "FromArray"
    assert_eq(ti, np.arange(10.0))


def test_take_of_take_composes():
    t = da.from_array(np.arange(10.0), chunks=5)
    tc = t[[5, 2, 8, 1]][[2, 0]]
    takes = [n for n in tc.expr.simplify().walk() if isinstance(n, Take)]
    assert len(takes) == 1
    # composed to [8, 5]; span culling then rebases onto the touched
    # block window [5, 10), so the take carries window-relative indices
    from dask_array_tpu.ops._from_array import FromArray

    leaf = next(n for n in tc.expr.simplify().walk() if isinstance(n, FromArray))
    base = leaf.region[0].start if leaf.region else 0
    np.testing.assert_array_equal(np.asarray(takes[0].indices) + base, [8, 5])
    assert_eq(tc, np.arange(10.0)[[8, 5]])


def test_take_absorbed_by_creation():
    o = da.ones((10, 4), chunks=(5, 4))[[1, 3, 5]]
    assert type(o.expr.simplify()).__name__ == "Ones"
    assert_eq(o, np.ones((3, 4)))


def test_take_commutes_with_other_axis_slice():
    x = da.from_array(np.arange(80.0).reshape(8, 10), chunks=(4, 5))
    r = x[[1, 5], :][:, 2:7]
    xn = np.arange(80.0).reshape(8, 10)
    assert_eq(r, xn[[1, 5], :][:, 2:7])
    # after simplify the slice sits under the take (reads less)
    opt = r.expr.simplify()
    assert isinstance(opt, Take)


# -- reduces work -----------------------------------------------------------


def test_take_through_elemwise_reduces_leaf_window():
    from dask_array_tpu.ops._from_array import FromArray

    x = da.from_array(np.arange(10000.0).reshape(100, 100), chunks=(10, 10))
    y = da.from_array(np.ones((100, 100)), chunks=(10, 10))
    r = (x + y)[[3, 7]]
    opt = r.expr.simplify()
    # the take sits on the leaves now: the elemwise computes 2 rows, not 100
    leaves_under_take = [
        n for n in opt.walk() if isinstance(n, Take) and isinstance(n.array, FromArray)
    ]
    assert len(leaves_under_take) == 2


def test_shuffle_pushes_through_transpose_values(rng):
    xn = rng.standard_normal((4, 5))
    x = da.from_array(xn, chunks=(2, 5))
    s = da.shuffle(x.T, [[1, 3], [0, 2]], axis=0)
    assert_eq(s, xn.T[[1, 3, 0, 2]])
    # pushed: no Shuffle above the Transpose anymore
    from dask_array_tpu._shuffle import Shuffle

    opt = s.expr.simplify()
    assert not isinstance(opt, Shuffle)


def test_shuffle_pushes_through_concatenate_values(rng):
    an = rng.standard_normal((4, 5))
    bn = rng.standard_normal((4, 5))
    a, b = da.from_array(an, chunks=(2, 5)), da.from_array(bn, chunks=(2, 5))
    c = da.concatenate([a, b], axis=1)
    s = da.shuffle(c, [[0, 2], [1, 3]], axis=0)
    assert_eq(s, np.concatenate([an, bn], axis=1)[[0, 2, 1, 3]])
    from dask_array_tpu._shuffle import Shuffle

    assert not isinstance(s.expr.simplify(), Shuffle)


# -- creation absorbs reorders ------------------------------------------------


def test_take_of_arange_absorbs_to_values_leaf():
    # the source iota must never materialize: an eager-lane take on a huge
    # arange allocated the full range before this absorption existed
    from dask_array_tpu.ops._from_array import FromArray

    a = da.arange(1_000_000_000_000, chunks=200_000_000, dtype="int64")
    idx = np.array([999_999_999_999, 0, 123_456_789_012], dtype="int64")
    t = da.take(a, idx, axis=0)
    opt = t.expr.simplify()
    assert isinstance(opt, FromArray)
    assert opt.source.nbytes == idx.nbytes
    np.testing.assert_array_equal(np.asarray(t.compute()), idx)


def test_take_of_arange_step_dtype():
    a = da.arange(10, 5000, 7, chunks=100, dtype="int32")
    ref = np.arange(10, 5000, 7, dtype="int32")
    idx = np.array([0, 700, 3, 699])
    got = da.take(a, idx)
    assert got.dtype == np.dtype("int32")
    np.testing.assert_array_equal(np.asarray(got.compute()), np.take(ref, idx))


def test_take_of_linspace_matches_numpy():
    ls = da.linspace(-2.5, 7.25, 1001, chunks=128)
    idx = np.array([1000, 0, 500, 3, 998])
    got = np.asarray(da.take(ls, idx).compute())
    np.testing.assert_allclose(got, np.take(np.linspace(-2.5, 7.25, 1001), idx), rtol=1e-15)


def test_shuffle_of_arange_absorbs():
    from dask_array_tpu.ops._from_array import FromArray

    s = da.shuffle(da.arange(100, chunks=10), [[5, 3], [97, 0, 1]], axis=0)
    assert isinstance(s.expr.simplify(), FromArray)
    np.testing.assert_array_equal(np.asarray(s.compute()), [5, 3, 97, 0, 1])


def test_take_negative_indices_on_arange():
    # take() normalizes negatives before the expression is built
    idx = np.array([-1, -200, 5])
    got = da.take(da.arange(1000, chunks=100), idx)
    np.testing.assert_array_equal(np.asarray(got.compute()), np.take(np.arange(1000), idx))


# -- span culling -------------------------------------------------------------


def test_take_span_culling_ships_one_block():
    from dask_array_tpu.ops._from_array import FromArray

    src = np.arange(1000.0)
    tk = da.take(da.from_array(src, chunks=100), np.array([550, 555, 560]))
    opt = tk.expr.simplify()
    leaves = [n for n in opt.walk() if isinstance(n, FromArray)]
    assert len(leaves) == 1
    # slice pushdown composed the block-aligned window into the leaf region
    assert leaves[0].region == (slice(500, 600, None),)
    np.testing.assert_array_equal(np.asarray(tk.compute()), src[[550, 555, 560]])


def test_take_span_culling_2d_other_axis(rng):
    src = rng.standard_normal((10, 1000))
    A = da.from_array(src, chunks=(5, 100))
    idx = np.array([321, 345, 399, 300])
    got = da.take(A, idx, axis=1)
    assert_eq(got, np.take(src, idx, axis=1))


def test_take_full_span_no_rewrite_loop(rng):
    # indices touching the first and last block: culling declines, values ok
    src = rng.standard_normal(1000)
    idx = np.array([0, 999, 500])
    got = da.take(da.from_array(src, chunks=100), idx)
    assert_eq(got, src[idx])
