"""map_blocks layout-stability spine: ported from the reference
``tests/test_map_blocks.py`` — explicit chunks and block_info/block_id
payloads must stay synchronized with the ADVERTISED layout even when the
optimizer rewrites the input subtree onto different chunks (sliding-window
fusion, slice/rechunk drift, lower-time drift).
"""

import functools

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._expr import ArrayExpr
from dask_array_tpu._collection import new_collection
from dask_array_tpu._test_utils import assert_eq


def test_map_blocks_explicit_chunks_preserves_rechunked_slice_block():
    x = da.ones((104, 2), chunks=(8, 2))
    arr = (x + 1)[95:103].rechunk((8, 2))

    def block_shape_code(block):
        return np.array([[100 * block.shape[0] + block.shape[1]]], dtype="int64")

    out = arr.map_blocks(block_shape_code, dtype="int64", chunks=(1, 1),
                         meta=np.array((), dtype="int64"))
    assert out.chunks == ((1,), (1,))
    np.testing.assert_array_equal(np.asarray(out.compute()), np.array([[802]], dtype="int64"))
    assert out.optimize().chunks == ((1,), (1,))


def test_map_blocks_explicit_chunks_preserves_multiple_input_block_shapes():
    x = da.ones((20, 2), chunks=(4, 2))
    arr = (x + 1)[3:11].rechunk(((3, 5), (2,)))

    def block_rows(block):
        return np.array([[block.shape[0]]], dtype="int64")

    out = arr.map_blocks(block_rows, dtype="int64", chunks=(1, 1),
                         meta=np.array((), dtype="int64"))
    assert arr.chunks == ((3, 5), (2,))
    assert out.chunks == ((1, 1), (1,))
    np.testing.assert_array_equal(np.asarray(out.compute()), np.array([[3], [5]]))
    assert out.optimize().chunks == ((1, 1), (1,))


def test_map_blocks_explicit_chunks_preserves_nested_elemwise_slice_block():
    x = da.ones((32, 2), chunks=(4, 2))
    y = da.where(da.isnan((x + 1) * 2), 0, (x + 1) * 2)
    arr = y[1:5].rechunk((4, 2))

    def block_shape_code(block):
        return np.array([[100 * block.shape[0] + block.shape[1]]], dtype="int64")

    out = arr.map_blocks(block_shape_code, dtype="int64", chunks=(1, 1),
                         meta=np.array((), dtype="int64"))
    assert arr.chunks == ((4,), (2,))
    assert out.chunks == ((1,), (1,))
    np.testing.assert_array_equal(np.asarray(out.compute()), np.array([[402]], dtype="int64"))


def test_map_blocks_without_explicit_chunks_preserves_input_block_shapes():
    x = da.ones((16,), chunks=(4,))
    y = da.where(da.isnan((x + 1) * 2), 0, (x + 1) * 2)
    arr = y[1:5]

    def block_length(block):
        return np.full(block.shape, block.shape[0], dtype="int64")

    out = arr.map_blocks(block_length, dtype="int64")
    assert arr.chunks == ((3, 1),)
    assert out.chunks == ((3, 1),)
    np.testing.assert_array_equal(np.asarray(out.compute()), np.array([3, 3, 3, 1]))


def test_map_blocks_invalid_explicit_chunk_count_still_raises():
    x = da.ones((4,), chunks=(1,))
    with pytest.raises(ValueError):
        y = x.map_blocks(lambda block: block, chunks=((1, 1),), dtype=x.dtype)
        y.compute()


def _sliding_sum():
    x = da.from_array(np.arange(150, dtype="f8").reshape(50, 3), chunks=(10, 3))
    return da.sliding_window_view(x, 25, axis=0).sum(axis=-1)


def _sliding_var():
    # NOTE: unlike the reference (whose sliding rewrite drifts the plan's
    # chunks, forcing a bridge), this framework's fusion preserves the
    # advertised layout by construction — the genuine-drift case is covered
    # by test_map_blocks_block_info_stable_through_lower_time_chunk_drift
    x = da.from_array(np.arange(96.0 * 8).reshape(96, 8), chunks=(24, 4))
    return da.sliding_window_view(x, 72, axis=0).var(axis=-1)


def test_map_blocks_block_info_stable_through_sliding_window_rewrite():
    r = _sliding_var()
    advertised = r.chunks

    calls = []

    def sentinel(block, block_info=None):
        info = block_info[None]
        input_info = block_info[0]
        calls.append((
            info["chunk-location"], tuple(block.shape), info["num-chunks"],
            input_info["chunk-location"], input_info["array-location"],
            input_info["num-chunks"],
        ))
        return np.zeros((1, 1), dtype="uint8")

    out = r.map_blocks(sentinel, dtype="uint8", chunks=(1, 1),
                       meta=np.array((), dtype="uint8"))
    numblocks = tuple(len(c) for c in advertised)
    assert out.numblocks == numblocks
    result = np.asarray(out.compute())
    assert result.shape == numblocks
    assert len(calls) == int(np.prod(numblocks))
    starts = [np.cumsum((0,) + c) for c in advertised]
    for loc, shape, num_chunks, input_loc, input_array_location, input_num_chunks in calls:
        assert tuple(num_chunks) == numblocks
        assert shape == tuple(c[i] for c, i in zip(advertised, loc))
        assert tuple(input_loc) == tuple(loc)
        assert tuple(input_num_chunks) == numblocks
        assert list(map(tuple, input_array_location)) == [
            (int(starts[axis][i]), int(starts[axis][i + 1])) for axis, i in enumerate(loc)
        ]


def test_map_blocks_block_info_one_task_per_day_through_rolling_slice_rechunk():
    spd, days, out_days, window = 10, 8, 3, 25
    n = spd * days
    x = da.from_array(np.arange(n * 3, dtype="f8").reshape(n, 3), chunks=(spd, 3))
    r = da.sliding_window_view(x, window, axis=0).sum(axis=-1)
    sliced = r[spd : spd + out_days * spd].rechunk((spd, 3))
    assert sliced.chunks == ((spd,) * out_days, (3,))

    calls = []

    def write_day(block, block_info=None):
        info = block_info[None]
        calls.append((tuple(info["chunk-location"]), tuple(block.shape), tuple(info["num-chunks"])))
        return np.zeros((1, 1), dtype="uint8")

    out = sliced.map_blocks(write_day, dtype="uint8", chunks=(1, 1),
                            meta=np.array((), dtype="uint8"))
    assert out.numblocks == (out_days, 1)
    result = np.asarray(out.compute())
    assert result.shape == (out_days, 1)
    assert sorted(loc for loc, _, _ in calls) == [(i, 0) for i in range(out_days)]
    for loc, shape, num_chunks in calls:
        assert shape == (spd, 3)
        assert num_chunks == (out_days, 1)


def test_map_blocks_block_id_stable_through_sliding_window_rewrite():
    r = _sliding_sum()
    advertised = r.chunks
    calls = []

    def sentinel(block, block_id=None):
        calls.append((tuple(block_id), tuple(block.shape)))
        return np.zeros((1, 1), dtype="uint8")

    out = r.map_blocks(sentinel, dtype="uint8", chunks=(1, 1),
                       meta=np.array((), dtype="uint8"))
    out.compute()
    numblocks = tuple(len(c) for c in advertised)
    assert len(calls) == int(np.prod(numblocks))
    for block_id, shape in calls:
        assert shape == tuple(c[i] for c, i in zip(advertised, block_id))


def test_freeze_chunks_pins_layout_without_materializing():
    r = _sliding_var()
    advertised = r.chunks
    frozen = r.freeze_chunks()
    assert frozen.freeze_chunks() is frozen  # idempotent
    assert frozen.optimize().chunks == advertised
    np.testing.assert_allclose(np.asarray(frozen.compute()), np.asarray(r.compute()))


class _LowerOnlyDrift(ArrayExpr):
    """Chunks drift only at LOWER time (not simplify)."""

    _parameters = ("array",)

    @functools.cached_property
    def chunks(self):
        return self.array.chunks

    @functools.cached_property
    def _meta(self):
        return self.array._meta

    def _lower(self):
        from dask_array_tpu._rechunk import Rechunk

        return Rechunk(self.array, ((2, 2, 2, 2),))


def test_map_blocks_block_info_stable_through_lower_time_chunk_drift():
    x = da.from_array(np.arange(8), chunks=(4,))
    arr = new_collection(_LowerOnlyDrift(x.expr))
    assert arr.chunks == ((4, 4),)

    calls = []

    def sentinel(block, block_info=None):
        input_info = block_info[0]
        calls.append((tuple(block.shape), tuple(input_info["chunk-location"]),
                      [tuple(t) for t in input_info["array-location"]]))
        return np.array([block.shape[0]], dtype="int64")

    out = arr.map_blocks(sentinel, dtype="int64", chunks=(1,),
                         meta=np.array((), dtype="int64"))
    np.testing.assert_array_equal(np.asarray(out.compute()), np.array([4, 4]))
    assert sorted(calls) == [((4,), (0,), [(0, 4)]), ((4,), (1,), [(4, 8)])]


# ---------------------------------------------------------------------------
# multi-output map_blocks (reference test_map_blocks_multi_output.py) — our
# signature takes dtypes/chunkss; the invariants ported: projected outputs
# compute and optimize correctly, and sibling projections SHARE the block
# call (one func invocation per block, not per output)
# ---------------------------------------------------------------------------


def test_map_blocks_multi_output_computes_projected_arrays():
    from dask_array_tpu.ops._map_blocks import map_blocks_multi_output

    x = da.from_array(np.arange(8).reshape(4, 2), chunks=(2, 2))

    def split_block(block):
        return block * 2, block.sum(axis=1, keepdims=True)

    double, row_sum = map_blocks_multi_output(
        split_block, x,
        dtypes=[x.dtype, x.dtype],
        chunkss=[x.chunks, (x.chunks[0], (1,))],
    )
    assert isinstance(double, da.Array) and isinstance(row_sum, da.Array)
    np.testing.assert_array_equal(
        np.asarray(double.compute()), np.arange(8).reshape(4, 2) * 2
    )
    np.testing.assert_array_equal(
        np.asarray(row_sum.compute()),
        np.arange(8).reshape(4, 2).sum(axis=1, keepdims=True),
    )
    np.testing.assert_array_equal(
        np.asarray(double.optimize().compute()), np.arange(8).reshape(4, 2) * 2
    )


def test_map_blocks_multi_output_shares_block_calls():
    from dask_array_tpu.ops._map_blocks import map_blocks_multi_output

    calls = []

    def record_block(block):
        calls.append(int(block[0]))
        return block + 1, block + 2

    x = da.from_array(np.arange(6), chunks=(3,))
    a, b = map_blocks_multi_output(record_block, x, dtypes=[x.dtype, x.dtype])
    got_a, got_b = da.compute(a, b)
    np.testing.assert_array_equal(np.asarray(got_a), np.arange(6) + 1)
    np.testing.assert_array_equal(np.asarray(got_b), np.arange(6) + 2)
    assert sorted(calls) == [0, 3]  # one call per block, shared by outputs


def test_map_blocks_multi_output_single_projection_computes_alone():
    from dask_array_tpu.ops._map_blocks import map_blocks_multi_output

    x = da.from_array(np.arange(6), chunks=(3,))
    a, b = map_blocks_multi_output(
        lambda block: (block + 1, block + 2), x, dtypes=[x.dtype, x.dtype]
    )
    np.testing.assert_array_equal(np.asarray(a.compute()), np.arange(6) + 1)
