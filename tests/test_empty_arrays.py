"""Zero-size array battery.

The reference supports zero-size dimensions throughout (numpy parity —
e.g. ``tests/test_routines.py::test_roll_works_even_if_shape_is_0``,
``test_einsum_empty_dimension``); the dense executor here represents a
zero-size dimension as one empty block (``chunks=((0,),)``).
"""

from __future__ import annotations

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._chunks import normalize_chunks


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def eq(d, n, **kw):
    v = np.asarray(d.compute())
    assert v.shape == n.shape
    assert v.dtype == n.dtype
    np.testing.assert_allclose(v, n, **kw)


# -- chunk normalization ------------------------------------------------------


def test_normalize_chunks_zero_dim():
    assert normalize_chunks(2, (0, 5)) == ((0,), (2, 2, 1))
    assert normalize_chunks((0, 2), (0, 4)) == ((0,), (2, 2))
    assert normalize_chunks("auto", (3, 0), dtype=np.dtype("f8")) == ((3,), (0,))


def test_normalize_chunks_zero_rejected_for_nonzero_dim():
    with pytest.raises(ValueError, match="positive"):
        normalize_chunks(0, (5,))
    with pytest.raises(ValueError, match="positive"):
        normalize_chunks(-2, (5,))


# -- creation -----------------------------------------------------------------


@pytest.mark.parametrize("shape", [(0,), (3, 0), (0, 5), (0, 0), (2, 0, 3)])
def test_creation_empty(shape):
    eq(da.zeros(shape), np.zeros(shape))
    eq(da.ones(shape, chunks=2), np.ones(shape))
    eq(da.full(shape, 7.0), np.full(shape, 7.0))


def test_arange_linspace_empty():
    eq(da.arange(0), np.arange(0))
    eq(da.arange(5, 5), np.arange(5, 5))
    eq(da.linspace(0, 1, num=0), np.linspace(0, 1, num=0))


def test_from_array_empty(rng):
    x = np.empty((3, 0))
    eq(da.from_array(x), x)
    eq(da.from_array(x, chunks=2), x)


# -- ops over empties ---------------------------------------------------------


def test_elemwise_empty():
    eq(da.zeros((3, 0)) + da.ones((3, 0)), np.zeros((3, 0)) + np.ones((3, 0)))
    eq(da.zeros((3, 0)) + da.ones((3, 1)), np.zeros((3, 0)) + np.ones((3, 1)))
    eq(da.zeros((3, 0)) * 2 + 1, np.zeros((3, 0)) * 2 + 1)


def test_reductions_empty():
    eq(da.zeros((3, 0)).sum(axis=1), np.zeros((3, 0)).sum(axis=1))
    eq(da.zeros((0, 3)).sum(axis=0), np.zeros((0, 3)).sum(axis=0))
    assert float(da.zeros((3, 0)).sum().compute()) == 0.0
    assert float(da.ones((0,)).prod().compute()) == 1.0


def test_manipulation_empty(rng):
    eq(da.zeros((3, 0)).T, np.zeros((0, 3)))
    eq(da.zeros((3, 0)).reshape(0, 3), np.zeros((0, 3)))
    x = np.empty((0, 4))
    eq(da.roll(da.from_array(x), 3), np.roll(x, 3))
    eq(da.ones((0, 6), chunks=(1, 2)).rechunk((1, 3)), np.ones((0, 6)))
    eq(da.zeros((3, 0))[1:, :], np.zeros((2, 0)))


def test_stack_concat_empty():
    eq(
        da.concatenate([da.ones((0, 3)), da.ones((2, 3))], axis=0),
        np.concatenate([np.ones((0, 3)), np.ones((2, 3))], axis=0),
    )
    eq(
        da.stack([da.zeros((0, 2)), da.zeros((0, 2))]),
        np.stack([np.zeros((0, 2)), np.zeros((0, 2))]),
    )


def test_contraction_empty():
    # reference: tests/test_routines.py::test_einsum_empty_dimension
    a = np.empty((3, 0))
    b = np.empty((0, 4))
    eq(da.from_array(a) @ da.from_array(b), a @ b)
    eq(da.einsum("ij,jk->ik", da.from_array(a), da.from_array(b)), np.einsum("ij,jk->ik", a, b))


def test_persist_store_empty(tmp_path):
    p = da.zeros((3, 0)).persist()
    eq(p, np.zeros((3, 0)))
    eq(p + 1, np.ones((3, 0)))


def test_map_blocks_empty():
    d = da.zeros((3, 0), chunks=2)
    eq(d.map_blocks(lambda b: b + 1), np.ones((3, 0)))


def test_boolean_mask_of_empty():
    d = da.zeros((0,))
    out = d[d > 0]
    v = np.asarray(out.compute())
    assert v.shape == (0,)
