"""Transpose-slice, slice-through-reshape, and stable-name batteries.

Ports the CASES of the reference's ``test_transpose_slice_pushdown.py``
(12 tests), ``test_slice_through_reshape.py`` (16), and
``test_stable_names.py`` (13).
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._slicing import Slice
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.ops._from_array import FromArray
from dask_array_tpu.ops.manipulation import Transpose


@pytest.fixture
def rng():
    return np.random.default_rng(53)


def leaf_chunks(expr):
    return [n.chunks for n in expr.walk() if isinstance(n, FromArray)]


# ---------------------------------------------------------------------------
# transpose x slice (parity: test_transpose_slice_pushdown.py)
# ---------------------------------------------------------------------------


def test_transpose_integer_slice_2d(rng):
    x = rng.standard_normal((12, 8))
    d = da.from_array(x, chunks=4)
    y = d.T[3]
    opt = y.expr.simplify()
    lcs = leaf_chunks(opt)
    # the integer composed into the leaf read: ONE source column remains
    assert lcs and int(np.prod([sum(c) for c in lcs[0]])) == 12, opt.tree_repr()
    assert_eq(y, x.T[3])


def test_transpose_integer_slice_scalar(rng):
    x = rng.standard_normal((6, 6))
    d = da.from_array(x, chunks=3)
    assert_eq(d.T[2, 4], x.T[2, 4])


def test_transpose_integer_slice_3d(rng):
    x = rng.standard_normal((6, 8, 4))
    d = da.from_array(x, chunks=2)
    y = d.transpose(2, 0, 1)[1]
    assert_eq(y, x.transpose(2, 0, 1)[1])


def test_transpose_mixed_slice_integer(rng):
    x = rng.standard_normal((10, 12))
    d = da.from_array(x, chunks=(5, 4))
    y = d.T[2:10, 7]
    opt = y.expr.simplify()
    lcs = leaf_chunks(opt)
    # one source row x 8 columns survive in the leaf read
    assert lcs and int(np.prod([sum(c) for c in lcs[0]])) == 8, opt.tree_repr()
    assert_eq(y, x.T[2:10, 7])


def test_transpose_custom_axes_slice(rng):
    x = rng.standard_normal((4, 6, 8))
    d = da.from_array(x, chunks=2)
    y = d.transpose(1, 2, 0)[2:5, ::2]
    assert_eq(y, x.transpose(1, 2, 0)[2:5, ::2])


def test_transpose_slice_shrinks_leaf(rng):
    x = rng.standard_normal((40, 40))
    d = da.from_array(x, chunks=10)
    y = d.T[:10, :20]
    opt = y.expr.simplify()
    lcs = leaf_chunks(opt)
    assert lcs and (sum(lcs[0][0]), sum(lcs[0][1])) == (20, 10), opt.tree_repr()
    assert_eq(y, x.T[:10, :20])


def test_transpose_pushes_through_elemwise(rng):
    # (a + b).T simplifies to aT + bT (transposes sink toward leaves)
    x = rng.standard_normal((8, 6))
    a = da.from_array(x, chunks=2)
    assert_eq((a + a).T, (x + x).T)
    assert_eq((a * 3).T, (x * 3).T)
    assert_eq((-a).T, (-x).T)


def test_transpose_of_transpose_collapses(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=2)
    y = d.T.T
    opt = y.expr.simplify()
    assert not any(isinstance(n, Transpose) for n in opt.walk()), opt.tree_repr()
    assert_eq(y, x)


def test_transpose_3d_roundtrip_collapses(rng):
    x = rng.standard_normal((4, 5, 6))
    d = da.from_array(x, chunks=2)
    y = d.transpose(2, 0, 1).transpose(1, 2, 0)
    opt = y.expr.simplify()
    assert not any(isinstance(n, Transpose) for n in opt.walk()), opt.tree_repr()
    assert_eq(y, x)


# ---------------------------------------------------------------------------
# slice through reshape (parity: test_slice_through_reshape.py)
# ---------------------------------------------------------------------------


def test_slice_through_reshape_leading_dim_preserved(rng):
    x = rng.standard_normal((8, 6, 4))
    d = da.from_array(x, chunks=(2, 6, 4))
    r = d.reshape(8, 24)
    y = r[2:6]
    assert_eq(y, x.reshape(8, 24)[2:6])


def test_slice_through_reshape_flatten_trailing(rng):
    x = rng.standard_normal((6, 4, 2))
    d = da.from_array(x, chunks=(3, 4, 2))
    assert_eq(d.reshape(6, 8)[1:5], x.reshape(6, 8)[1:5])


def test_slice_through_reshape_middle(rng):
    x = rng.standard_normal((10, 6))
    d = da.from_array(x, chunks=(5, 6))
    assert_eq(d.reshape(10, 2, 3)[3:8], x.reshape(10, 2, 3)[3:8])


def test_slice_on_reshaped_axis_correct(rng):
    x = rng.standard_normal((6, 4))
    d = da.from_array(x, chunks=(3, 4))
    assert_eq(d.reshape(24)[5:19], x.reshape(24)[5:19])


def test_reshape_expand_only(rng):
    x = rng.standard_normal((12,))
    d = da.from_array(x, chunks=4)
    assert_eq(d.reshape(12, 1), x.reshape(12, 1))
    assert_eq(d.reshape(1, 12), x.reshape(1, 12))
    assert_eq(d.reshape(3, 4), x.reshape(3, 4))


def test_reshape_minus_one(rng):
    x = rng.standard_normal((4, 6))
    d = da.from_array(x, chunks=2)
    assert_eq(d.reshape(-1), x.reshape(-1))
    assert_eq(d.reshape(-1, 6), x.reshape(-1, 6))


def test_reshape_interleaved_now_computes(rng):
    # (4, 6) -> (2, 12) interleaves axis boundaries; the reference's
    # reshape_rechunk raises NotImplementedError — here the dense executor
    # computes it (capability extension; plan falls back to auto chunks)
    x = rng.standard_normal((4, 6))
    d = da.from_array(x, chunks=2)
    np.testing.assert_allclose(
        np.asarray(d.reshape(2, 12).compute()), x.reshape(2, 12)
    )


def test_reshape_roundtrip_identity(rng):
    x = rng.standard_normal((8, 3))
    d = da.from_array(x, chunks=(4, 3))
    y = d.reshape(24).reshape(8, 3)
    assert_eq(y, x)


@pytest.mark.parametrize(
    "in_shape,out_shape,slc",
    [
        ((12, 4), (48,), np.s_[7:30]),
        ((2, 3, 4), (6, 4), np.s_[1:5, ::2]),
        ((24,), (4, 6), np.s_[2, 1:4]),
        ((4, 9), (4, 3, 3), np.s_[::2]),
    ],
)
def test_slice_through_reshape_correctness(rng, in_shape, out_shape, slc):
    x = rng.standard_normal(in_shape)
    d = da.from_array(x, chunks=3)
    assert_eq(d.reshape(out_shape)[slc], x.reshape(out_shape)[slc])


def test_ravel(rng):
    x = rng.standard_normal((6, 5))
    d = da.from_array(x, chunks=(2, 5))
    assert_eq(d.ravel(), x.ravel())
    assert_eq(da.ravel(d), x.ravel())


# ---------------------------------------------------------------------------
# stable names / persist identity (parity: test_stable_names.py)
# ---------------------------------------------------------------------------


def _pipeline(rng):
    x = rng.standard_normal((16, 16))
    d = da.from_array(x, chunks=4)
    return x, (d + d.T)[:8] * 2


def test_name_is_cheap_no_lowering(rng):
    x, y = _pipeline(rng)
    name = y.expr._name
    assert isinstance(name, str) and name
    assert y.expr._name == name  # cached, stable


def test_name_survives_optimization(rng):
    x, y = _pipeline(rng)
    before = y.expr._name
    y.optimize()
    assert y.expr._name == before


def test_identical_pipelines_share_names(rng):
    x = np.random.default_rng(99).standard_normal((8, 8))
    a = (da.from_array(x, chunks=4) + 1).expr
    b = (da.from_array(x, chunks=4) + 1).expr
    assert a._name == b._name
    assert a is b  # singleton registry


def test_persist_preserves_identity_and_composes(rng):
    x, y = _pipeline(rng)
    p = y.persist()
    assert p.expr.shape == y.expr.shape
    # composing on the persisted value computes from device buffers
    assert_eq(p + 1, (x + x.T)[:8] * 2 + 1)


def test_persist_twice_is_stable(rng):
    x, y = _pipeline(rng)
    p1 = y.persist()
    p2 = p1.persist()
    assert_eq(p2, (x + x.T)[:8] * 2)


def test_compute_after_persist_same_expression(rng):
    x, y = _pipeline(rng)
    p = y.persist()
    a = np.asarray(y.compute())
    b = np.asarray(p.compute())
    np.testing.assert_allclose(a, b)


def test_scalar_name_and_compute(rng):
    x, y = _pipeline(rng)
    s = y.sum()
    assert s.shape == ()
    assert_eq(s, ((x + x.T)[:8] * 2).sum())


def test_optimize_returns_new_collection_same_value(rng):
    x, y = _pipeline(rng)
    opt = y.optimize()
    assert_eq(opt, (x + x.T)[:8] * 2)


def test_rebuilt_pipeline_hits_executable_cache(rng):
    from dask_array_tpu import _executor

    x = np.random.default_rng(7).standard_normal((12, 12))
    y1 = (da.from_array(x, chunks=4) * 2).sum(axis=0)
    _ = y1.compute()
    before = dict(_executor._fn_cache)
    y2 = (da.from_array(x + 1, chunks=4) * 2).sum(axis=0)  # same STRUCTURE
    _ = y2.compute()
    # no new executable was compiled for the same program structure
    assert len(_executor._fn_cache) == len(before)


# -- interleaved-boundary reshape: dense fallback (capability extension;
# -- the reference raises here, manipulation/_reshape.py) ---------------------


@pytest.mark.parametrize(
    "inshape,outshape,chunks",
    [
        ((4, 6), (6, 4), (2, 3)),
        ((6, 10), (4, 15), (3, 5)),
        ((3, 5, 7), (7, 15), (2, 2, 3)),
        ((12,), (2, 3, 2), (5,)),
        ((30,), (6, 5), (7,)),
    ],
)
def test_interleaved_reshape_dense_fallback(rng, inshape, outshape, chunks):
    x = rng.standard_normal(inshape)
    d = da.from_array(x, chunks=chunks)
    out = d.reshape(outshape)
    assert out.shape == outshape
    np.testing.assert_allclose(np.asarray(out.compute()), x.reshape(outshape))


def test_interleaved_reshape_composes(rng):
    # downstream ops over the fallback grid still work
    x = rng.standard_normal((4, 6))
    d = da.from_array(x, chunks=(2, 3))
    out = (d.reshape((6, 4)) + 1).sum(axis=0)
    np.testing.assert_allclose(
        np.asarray(out.compute()), (x.reshape((6, 4)) + 1).sum(axis=0)
    )


# ---------------------------------------------------------------------------
# transpose pushdown through elemwise (reference
# test_transpose_slice_pushdown.py spine: transpose commutes with
# non-broadcasting elemwise, declines on broadcasting, composes with slices)
# ---------------------------------------------------------------------------


def _only_types(expr, *names):
    got = {type(e).__name__ for e in expr.walk()}
    return got <= set(names), got


def test_transpose_pushes_through_elemwise_add(rng):
    xn = rng.standard_normal((4, 6))
    x = da.from_array(xn, chunks=(2, 3))
    y = da.from_array(xn * 2, chunks=(2, 3))
    r = (x + y).T
    opt = r.expr.simplify()
    ok, got = _only_types(opt, "Elemwise", "Transpose", "FromArray")
    assert type(opt).__name__ == "Elemwise", got  # transpose moved inside
    np.testing.assert_allclose(np.asarray(r.compute()), (xn + xn * 2).T)


def test_transpose_pushes_through_elemwise_mul_and_scalar(rng):
    xn = rng.standard_normal((4, 6))
    x = da.from_array(xn, chunks=(2, 3))
    for r, expected in [((x * 3.0).T, (xn * 3.0).T), (da.negative(x).T, (-xn).T)]:
        opt = r.expr.simplify()
        assert type(opt).__name__ == "Elemwise"
        np.testing.assert_allclose(np.asarray(r.compute()), expected)


def test_transpose_custom_axes_through_elemwise(rng):
    xn = rng.standard_normal((3, 4, 5))
    x = da.from_array(xn, chunks=2)
    y = da.from_array(xn + 1, chunks=2)
    r = (x + y).transpose((2, 0, 1))
    opt = r.expr.simplify()
    assert type(opt).__name__ == "Elemwise"
    np.testing.assert_allclose(
        np.asarray(r.compute()), (xn + xn + 1).transpose((2, 0, 1))
    )


def test_transpose_through_elemwise_broadcasting_no_pushdown(rng):
    xn = rng.standard_normal((4, 6))
    x = da.from_array(xn, chunks=(2, 3))
    b = da.from_array(np.arange(6.0), chunks=3)
    r = (x + b).T
    opt = r.expr.simplify()
    assert type(opt).__name__ == "Transpose"  # declined: b broadcasts
    np.testing.assert_allclose(np.asarray(r.compute()), (xn + np.arange(6.0)).T)


def test_double_transpose_with_elemwise_between_collapses(rng):
    xn = rng.standard_normal((4, 6))
    x = da.from_array(xn, chunks=(2, 3))
    r = (x.T + 1.0).T
    opt = r.expr.simplify()
    names = [type(e).__name__ for e in opt.walk()]
    assert "Transpose" not in names, names
    np.testing.assert_allclose(np.asarray(r.compute()), xn + 1.0)


def test_transpose_pushdown_declines_on_shared_elemwise(rng):
    xn = rng.standard_normal((4, 4))
    x = da.from_array(xn, chunks=2)
    e = x + x
    shared = e.T + e  # e consumed twice: pushing would duplicate it
    opt = shared.expr.simplify()
    elemwise_adds = [e2 for e2 in opt.walk() if type(e2).__name__ == "Elemwise"]
    # inner e appears ONCE (shared), not duplicated into transposed copies
    inner = [e2 for e2 in elemwise_adds if any(
        type(d).__name__ == "FromArray" for d in e2.dependencies())]
    assert len(inner) == 1, [type(e2).__name__ for e2 in opt.walk()]
    np.testing.assert_allclose(np.asarray(shared.compute()), (xn + xn).T + (xn + xn))


def test_transpose_custom_axes_integer_slice(rng):
    xn = rng.standard_normal((3, 4, 5))
    x = da.from_array(xn, chunks=2)
    r = x.transpose((2, 0, 1))[1]
    np.testing.assert_allclose(np.asarray(r.compute()), xn.transpose((2, 0, 1))[1])
    # the slice maps through the permutation onto the source
    opt = r.expr.simplify()
    assert "FromArray" in {type(e).__name__ for e in opt.walk()}
