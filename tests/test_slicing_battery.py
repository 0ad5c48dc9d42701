"""Slicing edge-case battery (the reference's test_slicing.py axis)."""

import itertools

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


@pytest.mark.parametrize("chunks", [3, 5, ((7, 7, 6),), 10])
@pytest.mark.parametrize(
    "idx",
    [
        slice(None),
        slice(3, 17),
        slice(-5, None),
        slice(None, -3),
        slice(2, 18, 3),
        slice(18, 2, -3),
        slice(None, None, -1),
        slice(-1, -15, -2),
        slice(25, 30),      # fully out of range
        slice(5, 5),        # empty
        slice(-100, 100),   # over-wide
        7,
        -1,
    ],
)
def test_1d_slices(chunks, idx):
    x = np.arange(20.0)
    d = da.from_array(x, chunks=chunks)
    assert_eq(d[idx], x[idx])


def test_2d_combos(rng):
    x = rng.standard_normal((12, 15))
    d = da.from_array(x, chunks=(5, 4))
    combos = [
        (slice(2, 9), slice(None, None, 2)),
        (slice(None, None, -1), slice(None, None, -1)),
        (3, slice(1, -1)),
        (slice(None), -2),
        (Ellipsis, 4),
        (None, slice(2, 5), None, 7),
        (slice(10, 2, -2), slice(14, None, -3)),
    ]
    for idx in combos:
        assert_eq(d[idx], x[idx])


def test_newaxis_combinations(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=3)
    assert_eq(d[None], x[None])
    assert_eq(d[:, None, :], x[:, None, :])
    assert_eq(d[None, 2:4, None, ::2, None], x[None, 2:4, None, ::2, None])


def test_slice_then_ops(rng):
    x = rng.standard_normal((20, 20))
    d = da.from_array(x, chunks=6)
    assert_eq(d[::-2].sum(axis=0), x[::-2].sum(axis=0))
    assert_eq((d[5:15] + d[0:10]).T, (x[5:15] + x[0:10]).T)
    assert_eq(d[::3, ::-1][1:, 2:5], x[::3, ::-1][1:, 2:5])


def test_rechunk_specs():
    x = da.ones((100, 80), chunks=(10, 20))
    assert x.rechunk("auto").chunks is not None
    assert x.rechunk({0: 50}).chunks == ((50, 50), (20, 20, 20, 20))
    assert x.rechunk((-1, "auto")).chunks[0] == (100,)
    b = x.rechunk(30, balance=True)
    assert max(b.chunks[0]) - min(b.chunks[0]) <= 1


def test_masked_array_accepted_on_host_lane():
    # round 3: masked sources are accepted (host-lane passthrough); the
    # mask survives slicing — see tests/test_masked_arrays.py for the
    # full battery
    m = np.ma.masked_array([1.0, 2.0], mask=[False, True])
    out = da.from_array(m, chunks=1)[1:].compute()
    assert out[0] is np.ma.masked
