"""Creation edge-case battery.

Ported from the reference spine ``/root/reference/dask_array/tests/
test_creation.py``: arange/linspace slice pushdown (strided, reversed,
off-grid, empty, non-dyadic float steps), dtype inference, very-large
int64-edge args, indices validation, tile kroncompare examples, pad
callable mode and chunk-size preservation.  Structural assertions follow
this framework's discipline: pushed slices fold into a fusable creation
leaf (Arange), never a getitem over the full-size leaf.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.ops.creation import Arange, Linspace


PUSHDOWN_INDEXES = [
    slice(0, 30),  # contiguous
    slice(5, 45),  # off-grid contiguous
    slice(None, None, 7),  # strided
    slice(0, None, 100),  # stride wider than a chunk
    slice(None, None, -1),  # full reverse
    slice(950, 10, -3),  # negative step, off-grid
    slice(20, 20),  # empty slice
    slice(-5, None),  # negative start
    slice(3, 500, 13),  # strided off-grid
]


@pytest.mark.parametrize("index", PUSHDOWN_INDEXES)
@pytest.mark.parametrize("chunks", [100, 77])
def test_arange_slice_pushdown(chunks, index):
    x = da.arange(1000, chunks=chunks)
    y = x[index]
    assert_eq(y, np.arange(1000)[index], check_chunks=False)
    assert isinstance(y.expr.simplify(), Arange)  # fully absorbed


@pytest.mark.parametrize(
    "start,stop,step",
    [
        (0, 10, 0.5),  # dyadic float step (exact in binary)
        (2, 100, 2),  # integer, non-zero start
        (5, 0, -1),  # descending integer
        (0, 2, 0.1),  # non-dyadic float step: count*new_step re-derives
        (0, 10, 0.3),  # length to count+eps under ceil — must not trip chunks
        (1, 0, -0.01),  # descending non-dyadic float step
        (2.5, -2.5, -0.05),  # descending non-dyadic, non-zero start
    ],
)
@pytest.mark.parametrize(
    "index",
    [slice(None, None, 3), slice(None, None, -2), slice(2, None), slice(3, 17, 2), slice(None, None, 7)],
)
def test_arange_slice_pushdown_start_step(start, stop, step, index):
    x = da.arange(start, stop, step, chunks=4)
    y = x[index]
    y.compute()  # would raise "chunks do not add up" on a length re-derive bug
    assert_eq(y, np.arange(start, stop, step)[index], check_chunks=False, rtol=1e-12)
    assert y.dtype == np.arange(start, stop, step).dtype


@pytest.mark.parametrize("index", PUSHDOWN_INDEXES)
@pytest.mark.parametrize("endpoint", [True, False])
def test_linspace_slice_pushdown(endpoint, index):
    x = da.linspace(2.5, 97.5, 1000, endpoint=endpoint, chunks=100)
    y = x[index]
    assert_eq(y, np.linspace(2.5, 97.5, 1000, endpoint=endpoint)[index], check_chunks=False, rtol=1e-13)
    assert isinstance(y.expr.simplify(), (Arange, Linspace))


def test_arange_float_step():
    for args, chunks in [((2.0, 13.0, 0.3), 4), ((7.7, 1.5, -0.8), 3), ((0, 1, 0.01), 20), ((0, 1e-6, 1e-9), 100)]:
        assert_eq(da.arange(*args, chunks=chunks), np.arange(*args), check_chunks=False, rtol=1e-12)


@pytest.mark.parametrize(
    "start,stop,step",
    [
        (2**63 - 10_000, 2**63 - 1, 1),
        (2**63 - 1, 2**63 - 10_000, -1),
        (0, 2**63 - 1, 2**63 - 10_000),
        (0.0, 2**63 - 1, 2**63 - 10_000),
        (0.0, -9_131_138_316_486_228_481, -92_233_720_368_547_759),
        (-72_057_594_037_927_945, -72_057_594_037_927_938, 1.0),
        (-72_057_594_037_927_945, -72_057_594_037_927_938, 1.5),
    ],
)
def test_arange_very_large_args(start, stop, step):
    # args within 10k of the int64 edge (dask#11706 class of overflow bugs)
    a_np = np.arange(start, stop, step)
    a_da = da.arange(start, stop, step, chunks="auto")
    assert_eq(a_da, a_np, check_chunks=False)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint64, np.int8, np.int64, np.float32, np.float64])
def test_arange_dtype_force(dtype):
    assert da.arange(10, chunks=5, dtype=dtype).dtype == dtype
    assert_eq(da.arange(10, chunks=5, dtype=dtype), np.arange(10, dtype=dtype), check_chunks=False)


@pytest.mark.parametrize(
    "start,stop,step",
    [(0, 5, 1), (0.0, 5, 1), (0, 5.0, 1), (0, 5, 1.0), (-3, 12, 2)],
)
def test_arange_dtype_infer(start, stop, step):
    assert da.arange(start, stop, step, chunks=3).dtype == np.arange(start, stop, step).dtype


# ---------------------------------------------------------------------------
# indices
# ---------------------------------------------------------------------------


def test_indices_wrong_chunks():
    with pytest.raises(ValueError):
        da.indices((1,), chunks=tuple())


def test_indices_dimensions_chunks():
    chunks = ((1, 4, 2, 3), (5, 5))
    darr = da.indices((10, 10), chunks=chunks)
    assert darr.chunks == ((1, 1),) + chunks
    assert_eq(darr, np.indices((10, 10)), check_chunks=False, check_dtype=False)


def test_empty_indices():
    darr = da.indices(tuple(), chunks=tuple())
    nparr = np.indices(tuple())
    assert darr.shape == nparr.shape
    assert_eq(darr, nparr, check_dtype=False, check_chunks=False)

    darr = da.indices((0,), float, chunks=(1,))
    nparr = np.indices((0,), float)
    assert darr.shape == nparr.shape
    assert darr.dtype == nparr.dtype
    assert_eq(darr, nparr, check_chunks=False)


# ---------------------------------------------------------------------------
# tile / pad edges
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape, reps",
    [
        ((), 2),
        ((), (2, 3)),
        ((2, 3), 2),
        ((2, 3), (2, 1)),
        ((2, 3), (2, 2)),
        ((4, 3, 2), (2, 1, 2)),
        ((3,), (2, 1, 2)),
    ],
)
def test_tile_np_kroncompare_examples(shape, reps):
    rng = np.random.default_rng(0)
    x = rng.random(shape)
    d = da.asarray(x)
    assert_eq(np.tile(x, reps), da.tile(d, reps), check_chunks=False)


@pytest.mark.parametrize("kwargs", [{}, {"scaler": 2}])
def test_pad_udf(kwargs):
    def udf_pad(vector, pad_width, iaxis, inner_kwargs):
        assert kwargs == inner_kwargs
        scaler = inner_kwargs.get("scaler", 1)
        vector[: pad_width[0]] = -scaler * pad_width[0]
        vector[-pad_width[1]:] = scaler * pad_width[1]
        return vector

    rng = np.random.default_rng(1)
    np_a = rng.random((10, 11))
    da_a = da.from_array(np_a, chunks=(4, 5))

    np_r = np.pad(np_a, ((1, 2), (2, 3)), udf_pad, **kwargs)
    da_r = da.pad(da_a, ((1, 2), (2, 3)), udf_pad, **kwargs)
    assert_eq(np_r, da_r, check_chunks=False)


def test_pad_constant_chunksizes():
    # padding must not glue the pad band onto a data chunk
    array = da.ones((10, 10), chunks=(1, 1))
    result = da.pad(array, ((0, 6), (0, 0)), mode="constant", constant_values=0)
    assert tuple(map(max, result.chunks)) == (1, 1)
    assert_eq(
        result,
        np.pad(np.ones((10, 10)), ((0, 6), (0, 0)), mode="constant", constant_values=0),
        check_chunks=False,
    )


def test_pad_0_width():
    rng = np.random.default_rng(2)
    np_a = rng.random((10, 11))
    da_a = da.from_array(np_a, chunks=(4, 5))
    for mode in ["constant", "edge", "wrap", "reflect", "symmetric"]:
        assert_eq(np.pad(np_a, 0, mode=mode), da.pad(da_a, 0, mode=mode), check_chunks=False)


def test_like_family_order_kwarg():
    d = da.ones((4, 5), chunks=2)
    for fn in [da.ones_like, da.zeros_like, da.empty_like]:
        assert fn(d, order="K").shape == (4, 5)
        with pytest.raises(NotImplementedError):
            fn(d, order="F")
    assert da.full_like(d, 7, order="C").compute().max() == 7


# --- reference spine stragglers (test_creation.py tile/auto/like corners) ---


def test_tile_basic_grid():
    a = da.asarray([0, 1, 2])
    b = [[1, 2], [3, 4]]
    for reps in [2, (2, 2), (1, 2), (2, 1), (2, 3, 4, 0)]:
        np.testing.assert_array_equal(
            np.asarray(da.tile(a, reps).compute()), np.tile([0, 1, 2], reps)
        )
        np.testing.assert_array_equal(
            np.asarray(da.tile(b, reps).compute()), np.tile(b, reps)
        )


def test_string_auto_chunk_uses_real_itemsize():
    # DIVERGENCE (stronger): the reference refuses auto chunks for string
    # fills; here the fixed-width dtype's itemsize drives the auto grid
    x = da.full((10000, 10000), "auto_chunk", chunks="auto")
    assert x.dtype == np.dtype("<U10")
    assert all(c[0] < 10000 for c in x.chunks)


def test_from_array_getitem_fused():
    arr = np.arange(100).reshape(10, 10)
    darr = da.from_array(arr, chunks=(5, 5))
    result = darr[slice(1, 5), :][slice(1, 3), :]
    np.testing.assert_array_equal(
        np.asarray(result.compute()), arr[slice(1, 5), :][slice(1, 3), :]
    )
    # the two slices fuse into one (slice-of-slice composition)
    from dask_array_tpu._slicing import Slice

    opt = result.expr.simplify()
    assert sum(1 for e in opt.walk() if isinstance(e, Slice)) <= 1


@pytest.mark.parametrize("dtype", ["u4", np.float32, None, np.int64])
def test_nan_empty_full_like(dtype):
    x1 = da.from_array(np.random.default_rng(3).standard_normal(50), chunks=10)
    y1 = x1[x1 < 0.5]
    y2 = np.asarray(x1.compute())
    y2 = y2[y2 < 0.5]
    a_da = np.asarray(da.empty_like(y1, dtype=dtype).compute())
    a_np = np.empty_like(y2, dtype=dtype)
    assert a_da.shape == a_np.shape and a_da.dtype == a_np.dtype
    np.testing.assert_array_equal(
        np.asarray(da.full_like(y1, 7, dtype=dtype).compute()),
        np.full_like(y2, 7, dtype=dtype),
    )


def test_like_forgets_graph():
    import pickle

    x = da.arange(3).map_blocks(lambda b: b)  # unpicklable local lambda
    with pytest.raises(Exception):
        pickle.dumps(x)
    for func in [da.array, da.asarray, da.asanyarray]:
        a = func(1, like=x)
        pickle.dumps(a)  # like= must not retain x's graph
