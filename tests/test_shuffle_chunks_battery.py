"""Shuffle/Take output-chunk sizing and graph-integrity battery.

Ports the CASES of the reference's ``tests/test_shuffle_chunks.py``
(215 LoC): fancy-index output chunks stay near the input chunk size
(locality grouping), identity indexers vanish, and the adversarial
misaligned-grid concatenate/stack compositions that corrupted the
reference's task graphs ("graph completeness") must stay value-exact —
the repo's dense trace has no task keys to dangle, so value+shape parity
under the same shrunken falsifying inputs is the equivalent property.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._shuffle import Shuffle
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.ops._fancy_indexing import Take


def test_contiguous_indexing_splits_to_input_chunk_size():
    # np.repeat pattern: each input chunk of 25 becomes 75 output elements,
    # split back into 25-wide chunks (3 per input chunk)
    np_x = np.arange(100 * 10).reshape(100, 10)
    x = da.from_array(np_x, chunks=(25, 10))
    indexer = np.repeat(np.arange(100), 3)
    result = x[indexer, :]
    assert max(result.chunks[0]) == 25
    assert result.numblocks[0] == 12
    assert_eq(result, np_x[indexer, :])


def test_scattered_indexing_correctness():
    np_x = np.arange(100 * 10).reshape(100, 10)
    x = da.from_array(np_x, chunks=(25, 10))
    indexer = np.tile(np.arange(100), 3)
    assert_eq(x[indexer, :], np_x[indexer, :])


def test_identity_indexing_no_shuffle():
    np_x = np.arange(120).reshape(12, 10)
    x = da.from_array(np_x, chunks=(3, 10))
    result = x[np.arange(12), :]
    simplified = result.expr.simplify()
    assert not any(isinstance(n, (Shuffle, Take)) for n in simplified.walk())
    assert_eq(result, np_x)


def test_large_repeat_splits_oversized_groups():
    # each element repeated 100x: naive grouping would make 2500-wide chunks
    np_x = np.arange(100 * 10).reshape(100, 10)
    x = da.from_array(np_x, chunks=(25, 10))
    indexer = np.repeat(np.arange(100), 100)
    result = x[indexer, :]
    assert max(result.chunks[0]) == 25
    assert_eq(result, np_x[indexer, :])


# -- misaligned-grid compositions (the reference's hypothesis-shrunk cases) ----


@pytest.fixture
def misaligned_3d():
    np_a = np.arange(3.0).reshape(3, 1, 1)
    a = da.from_array(np_a, chunks=((1, 1, 1), (1,), (1,)))
    np_b = (np.arange(3.0) + 10).reshape(3, 1, 1)
    b = da.from_array(np_b, chunks=((2, 1), (1,), (1,)))
    np_c = (np.arange(3.0) + 20).reshape(3, 1, 1)
    c = da.from_array(np_c, chunks=((1, 1, 1), (1,), (1,)))
    return (a + b, np_a + np_b), (c, np_c)


@pytest.fixture
def misaligned_2d():
    np_m = np.arange(9.0).reshape(3, 3)
    m = da.from_array(np_m, chunks=((1, 1, 1), (3,)))
    n = da.from_array(np_m + 10, chunks=((2, 1), (2, 1)))
    p = da.from_array(np_m + 20, chunks=((2, 1), (1, 1, 1)))
    return (m + n, np_m + np_m + 10), (p, np_m + 20)


def test_take_through_concatenate_misaligned_grids(misaligned_3d):
    # a take distributed over concat inputs whose shuffles settle to
    # different layouts must stay exact in both input orders
    (e, np_e), (c, np_c) = misaligned_3d
    for da_seq, np_seq in (([e, c], [np_e, np_c]), ([c, e], [np_c, np_e])):
        result = da.concatenate(da_seq, axis=1)[[0, 0]]
        expected = np.concatenate([t[[0, 0]] for t in np_seq], axis=1)
        assert_eq(result, expected)


def test_take_under_concatenate_misaligned_grids(misaligned_2d):
    (e, np_e), (p, np_p) = misaligned_2d
    for da_seq, np_seq in (([e, p], [np_e, np_p]), ([p, e], [np_p, np_e])):
        result = da.concatenate([t[[0, 0]] for t in da_seq], axis=1)
        expected = np.concatenate([t[[0, 0]] for t in np_seq], axis=1)
        assert_eq(result, expected)


def test_take_through_stack_misaligned_grids(misaligned_3d):
    (e, np_e), (c, np_c) = misaligned_3d
    for da_seq, np_seq in (([e, c], [np_e, np_c]), ([c, e], [np_c, np_e])):
        result = da.stack(da_seq, axis=1)[[0, 0]]
        expected = np.stack([t[[0, 0]] for t in np_seq], axis=1)
        assert_eq(result, expected)


def test_take_under_stack_misaligned_grids(misaligned_2d):
    (e, np_e), (p, np_p) = misaligned_2d
    for da_seq, np_seq in (([e, p], [np_e, np_p]), ([p, e], [np_p, np_e])):
        result = da.stack([t[[0, 0]] for t in da_seq], axis=0)
        expected = np.stack([t[[0, 0]] for t in np_seq], axis=0)
        assert_eq(result, expected)


def test_nested_empty_concatenate_shapes():
    # a zero-length axis can carry any number of zero-blocks: inner concat
    # along it yields a (0, 0) grid where a plain empty has (0,); an outer
    # concat on ANOTHER axis must handle the disagreeing empty-block counts
    np_row = np.arange(3.0).reshape(1, 3)
    row = da.from_array(np_row, chunks=(1, 1))
    np_empty = np_row[0:0, 0:0]
    empty = row[0:0, 0:0]  # (0, 0) via slicing, as it arises in practice
    other = da.from_array(np_empty, chunks=(1, 1))

    inner = da.concatenate([empty, other], axis=0)
    np_inner = np.concatenate([np_empty, np_empty], axis=0)
    tail = da.from_array(np_empty, chunks=(1, 1))

    result = da.concatenate([inner, tail], axis=1)
    expected = np.concatenate([np_inner, np_empty], axis=1)
    assert np.asarray(result.compute()).shape == expected.shape

    result = da.concatenate(
        [tail, inner, da.concatenate([other, other], axis=0)], axis=1
    )
    expected = np.concatenate([np_empty, np_inner, np_inner], axis=1)
    assert np.asarray(result.compute()).shape == expected.shape
