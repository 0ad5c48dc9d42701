"""Setitem + stacking structural/value battery.

Ports the CASES of the reference's setitem suite (``slicing/_setitem.py``)
and stacking families (``stacking/``): assignment shapes, broadcasting,
masks, seams, block fusion, and nesting.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


@pytest.fixture
def rng():
    return np.random.default_rng(73)


# -- setitem -------------------------------------------------------------------


def _pair(rng, shape=(10, 8), chunks=(4, 3)):
    x = rng.standard_normal(shape)
    return x.copy(), da.from_array(x, chunks=chunks)


def test_setitem_basic_slice(rng):
    x, d = _pair(rng)
    d[2:6, 1:5] = 7.0
    x[2:6, 1:5] = 7.0
    assert_eq(d, x)


def test_setitem_integer_row(rng):
    x, d = _pair(rng)
    d[3] = -1.0
    x[3] = -1.0
    assert_eq(d, x)


def test_setitem_array_value_broadcast(rng):
    x, d = _pair(rng)
    v = rng.standard_normal((8,))
    d[4:7] = v
    x[4:7] = v
    assert_eq(d, x)


def test_setitem_lazy_value(rng):
    x, d = _pair(rng)
    v = rng.standard_normal((3, 8))
    d[1:4] = da.from_array(v, chunks=(2, 4))
    x[1:4] = v
    assert_eq(d, x)


def test_setitem_negative_indices(rng):
    x, d = _pair(rng)
    d[-2:] = 0.0
    x[-2:] = 0.0
    assert_eq(d, x)


def test_setitem_strided(rng):
    x, d = _pair(rng)
    d[::2, ::3] = 5.0
    x[::2, ::3] = 5.0
    assert_eq(d, x)


def test_setitem_boolean_mask(rng):
    x, d = _pair(rng)
    mask = x > 0.5
    d[da.from_array(mask, chunks=(4, 3))] = 0.0
    x[mask] = 0.0
    assert_eq(d, x)


def test_setitem_does_not_mutate_source(rng):
    x, d = _pair(rng)
    before = d + 0  # snapshot expression over the same leaf
    d[0:2] = 99.0
    got_before = np.asarray(before.compute())
    np.testing.assert_allclose(got_before, x)  # old reads unaffected


def test_setitem_chain(rng):
    x, d = _pair(rng)
    d[0] = 1.0
    d[1] = 2.0
    d[2, 3:5] = 3.0
    x[0] = 1.0
    x[1] = 2.0
    x[2, 3:5] = 3.0
    assert_eq(d, x)


def test_setitem_then_reduce(rng):
    x, d = _pair(rng)
    d[5:] = 0.0
    x[5:] = 0.0
    assert_eq(d.sum(axis=0), x.sum(axis=0))


# -- concatenate/stack/block ------------------------------------------------------


def test_concatenate_axis0_and_1(rng):
    xs = [rng.standard_normal((4, 6)) for _ in range(3)]
    ds = [da.from_array(x, chunks=(2, 3)) for x in xs]
    assert_eq(da.concatenate(ds, axis=0), np.concatenate(xs, axis=0))
    assert_eq(da.concatenate(ds, axis=1), np.concatenate(xs, axis=1))
    assert_eq(da.concatenate(ds, axis=-1), np.concatenate(xs, axis=-1))


def test_concatenate_dtype_promotion(rng):
    a = da.from_array(rng.integers(0, 5, (4,)), chunks=2)
    b = da.from_array(rng.standard_normal((4,)), chunks=2)
    out = da.concatenate([a, b])
    assert out.dtype == np.promote_types(a.dtype, b.dtype)


def test_concatenate_mismatched_shapes_raise(rng):
    a = da.from_array(rng.standard_normal((4, 3)), chunks=2)
    b = da.from_array(rng.standard_normal((4, 5)), chunks=2)
    with pytest.raises(ValueError):
        da.concatenate([a, b], axis=0)


def test_concatenate_single_is_cheap(rng):
    a = da.from_array(rng.standard_normal((4,)), chunks=2)
    out = da.concatenate([a])
    assert out.expr.simplify()._name == a.expr._name


def test_stack_axes(rng):
    xs = [rng.standard_normal((3, 4)) for _ in range(4)]
    ds = [da.from_array(x, chunks=2) for x in xs]
    for axis in (0, 1, 2, -1):
        assert_eq(da.stack(ds, axis=axis), np.stack(xs, axis=axis))


def test_stack_mismatched_raise(rng):
    a = da.from_array(rng.standard_normal((3,)), chunks=2)
    b = da.from_array(rng.standard_normal((4,)), chunks=2)
    with pytest.raises(ValueError):
        da.stack([a, b])


def test_vstack_hstack_dstack(rng):
    x = rng.standard_normal((3, 4))
    y = rng.standard_normal((3, 4))
    dx, dy = da.from_array(x, chunks=2), da.from_array(y, chunks=2)
    assert_eq(da.vstack([dx, dy]), np.vstack([x, y]))
    assert_eq(da.hstack([dx, dy]), np.hstack([x, y]))
    assert_eq(da.dstack([dx, dy]), np.dstack([x, y]))
    v = rng.standard_normal((5,))
    dv = da.from_array(v, chunks=2)
    assert_eq(da.vstack([dv, dv]), np.vstack([v, v]))
    assert_eq(da.hstack([dv, dv]), np.hstack([v, v]))


def test_block_nested(rng):
    a = rng.standard_normal((2, 3))
    b = rng.standard_normal((2, 2))
    c = rng.standard_normal((1, 3))
    d_ = rng.standard_normal((1, 2))
    got = da.block([
        [da.from_array(a, chunks=1), da.from_array(b, chunks=1)],
        [da.from_array(c, chunks=1), da.from_array(d_, chunks=1)],
    ])
    want = np.block([[a, b], [c, d_]])
    assert_eq(got, want)


def test_block_1d(rng):
    xs = [rng.standard_normal((3,)) for _ in range(3)]
    got = da.block([da.from_array(x, chunks=2) for x in xs])
    assert_eq(got, np.block(list(xs)))


def test_concatenate_then_slice_culls(rng):
    # seam-respecting slice through a concat of many parts culls parts
    parts = [rng.standard_normal((5, 4)) for _ in range(6)]
    c = da.concatenate([da.from_array(p, chunks=5) for p in parts], axis=0)
    s = c[12:18]
    from dask_array_tpu.ops._from_array import FromArray

    opt = s.expr.simplify()
    leaves = [n for n in opt.walk() if isinstance(n, FromArray)]
    assert len(leaves) <= 2, opt.tree_repr()
    assert_eq(s, np.concatenate(parts)[12:18])


def test_concatenate_unknown_chunks_eager(rng):
    x = rng.standard_normal((20,))
    d = da.from_array(x, chunks=5)
    masked = d[da.from_array(x > 0, chunks=5)]
    out = da.concatenate([masked, masked])
    want = np.concatenate([x[x > 0], x[x > 0]])
    np.testing.assert_allclose(np.asarray(out.compute()), want)


def test_append_insert_delete(rng):
    x = rng.standard_normal((10,))
    d = da.from_array(x, chunks=4)
    assert_eq(da.append(d, [1.0, 2.0]), np.append(x, [1.0, 2.0]))
    assert_eq(da.insert(d, 3, 9.0), np.insert(x, 3, 9.0))
    assert_eq(da.delete(d, [1, 5]), np.delete(x, [1, 5]))
