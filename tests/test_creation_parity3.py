"""Round-3 creation parity battery, ported from the reference spine
(/root/reference/dask_array/tests/test_creation.py): the arr_like grid
(names, orders, shape= overrides), the full linspace matrix incl. lazy
scalar bounds, arange int-cast semantics, diag/diagonal grids, tile
neg/zero/empty reps, the full pad mode grid incl. empty axes and typed
fill values, and the string-byte-chunk validation set."""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu import config
from dask_array_tpu._test_utils import assert_eq


@pytest.fixture
def rng():
    return np.random.default_rng(31)


# ---------------------------------------------------------------------------
# arr_like grid (reference test_arr_like / test_arr_like_shape)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("funcname", [
    "empty_like", "empty", "ones_like", "ones", "zeros_like", "zeros", "full_like", "full"])
@pytest.mark.parametrize("cast_shape", [tuple, list, np.asarray])
@pytest.mark.parametrize("name", [None, "my-name"])
def test_arr_like(funcname, cast_shape, name, rng):
    shape, chunks, dtype = (10, 10), (4, 4), np.dtype("i4")
    np_func = getattr(np, funcname)
    da_func = getattr(da, funcname)
    if "full" in funcname:
        onp, oda = np_func, da_func
        np_func = lambda *a, **k: onp(*a, fill_value=5, **k)
        da_func = lambda *a, **k: oda(*a, fill_value=5, **k)
    shape_arg = cast_shape(shape)
    if "like" in funcname:
        a = rng.integers(0, 10, shape).astype(dtype)
        np_r = np_func(a)
        da_r = da_func(a, chunks=chunks, name=name)
    else:
        np_r = np_func(shape_arg, dtype=dtype)
        da_r = da_func(shape_arg, dtype=dtype, chunks=chunks, name=name)
    assert np_r.shape == da_r.shape
    assert np_r.dtype == da_r.dtype
    if "empty" not in funcname:
        assert_eq(np_r, da_r)
    if name is None:
        assert funcname.split("_")[0] in da_r.name
    else:
        assert da_r.name == name


@pytest.mark.parametrize(
    "funcname, kwargs",
    [("empty_like", {}), ("ones_like", {}), ("zeros_like", {}), ("full_like", {"fill_value": 5})],
)
@pytest.mark.parametrize(
    "shape, chunks, out_shape",
    [
        ((10, 10), (4, 4), None),
        ((10, 10), (4, 4), (20, 3)),
        ((10, 10), (4), (20)),
        ((10, 10, 10), (4, 2), (5, 5)),
        ((2, 3, 5, 7), None, (3, 5, 7)),
        ((2, 3, 5, 7), (2, 5, 3), (3, 5, 7)),
        ((2, 3, 5, 7), (2, 5, 3, "auto", 3), (11,) + (2, 3, 5, 7)),
        ((2, 3, 5, 7), "auto", (3, 5, 7)),
    ],
)
def test_arr_like_shape(rng, funcname, kwargs, shape, chunks, out_shape):
    np_func = getattr(np, funcname)
    da_func = getattr(da, funcname)
    a = rng.integers(0, 10, shape).astype("i4")
    np_r = np_func(a, shape=out_shape, **kwargs)
    da_r = da_func(a, chunks=chunks, shape=out_shape, **kwargs)
    assert np_r.shape == da_r.shape
    assert np_r.dtype == da_r.dtype
    if "empty" not in funcname:
        assert_eq(np_r, da_r)


# ---------------------------------------------------------------------------
# linspace / arange (reference test_linspace + scalar bounds + cast)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("endpoint", [True, False])
def test_linspace_matrix(endpoint):
    assert_eq(da.linspace(6, 49, endpoint=endpoint, chunks=5), np.linspace(6, 49, endpoint=endpoint))
    assert_eq(
        da.linspace(1.4, 4.9, endpoint=endpoint, chunks=5, num=13),
        np.linspace(1.4, 4.9, endpoint=endpoint, num=13),
    )
    assert_eq(
        da.linspace(6, 49, endpoint=endpoint, chunks=5, dtype=float),
        np.linspace(6, 49, endpoint=endpoint, dtype=float),
    )
    darr, dstep = da.linspace(6, 49, endpoint=endpoint, chunks=5, retstep=True)
    nparr, npstep = np.linspace(6, 49, endpoint=endpoint, retstep=True)
    assert np.allclose(dstep, npstep)
    assert_eq(darr, nparr)
    assert_eq(
        da.linspace(1.4, 4.9, endpoint=endpoint, chunks=5, num=13, dtype=int),
        np.linspace(1.4, 4.9, num=13, endpoint=endpoint, dtype=int),
    )
    # determinism
    assert (
        da.linspace(1.4, 4.9, endpoint=endpoint, chunks=5, num=13).expr._name
        == da.linspace(1.4, 4.9, endpoint=endpoint, chunks=5, num=13).expr._name
    )
    # degenerate sizes
    for args in [(0, 0, 0), (1, 1, 0), (1, 5, 0), (0, 0, 1), (1, 1, 1), (1, 5, 1)]:
        assert_eq(da.linspace(*args, endpoint=endpoint), np.linspace(*args, endpoint=endpoint))


@pytest.mark.parametrize("endpoint", [True, False])
def test_linspace_dask_scalar_bounds(endpoint):
    x = da.array([0.2, 6.4, 3.0, 1.6])
    nparr = np.linspace(0, 2, 8, endpoint=endpoint)
    darr = da.linspace(da.argmin(x), da.argmax(x) + 1, 8, endpoint=endpoint)
    assert_eq(darr, nparr)


def test_arange_cast_float_int_step():
    darr = da.arange(3.3, -9.1, -0.25, chunks=3, dtype="i8")
    nparr = np.arange(3.3, -9.1, -0.25, dtype="i8")
    assert_eq(darr, nparr)
    # slices of the cast range stay consistent (pushdown must not recompute
    # per-block float offsets)
    assert_eq(darr[10:30], nparr[10:30])
    assert_eq(darr[::-3], nparr[::-3])


def test_meshgrid_inputcoercion():
    a = [1, 2, 3]
    b = np.array([4, 5, 6, 7])
    x, y = np.meshgrid(a, b, indexing="ij")
    x_d, y_d = da.meshgrid(a, b, indexing="ij")
    z_d = x_d * y_d
    assert z_d.shape == (len(a), len(b))
    assert_eq(x * y, z_d)


# ---------------------------------------------------------------------------
# diag / diagonal (reference k-grids)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k", [0, 3, -3, 8])
def test_diag_2d_array_creation(k):
    v = np.arange(11)
    assert_eq(da.diag(v, k), np.diag(v, k))
    v = da.arange(11, chunks=3)
    assert_eq(da.diag(v, k), np.diag(np.arange(11), k))
    assert da.diag(v, k).expr._name == da.diag(v, k).expr._name
    v2 = v + v + 3
    assert_eq(da.diag(v2, k), np.diag(np.asarray(v2.compute()), k))


@pytest.mark.parametrize("k", [0, 3, -3, 8])
def test_diag_extraction_chunked(k):
    x = np.arange(64).reshape((8, 8))
    d = da.from_array(x, chunks=(4, 4))
    assert_eq(da.diag(d, k), np.diag(x, k))


@pytest.mark.parametrize("k", [0, -3])
def test_diag_bad_input(k):
    v = np.arange(2 * 3 * 4).reshape((2, 3, 4))
    with pytest.raises(ValueError, match="1d or 2d"):
        da.diag(v, k)
    v = da.arange(2 * 3 * 4, chunks=6).reshape((2, 3, 4))
    with pytest.raises(ValueError, match="1d or 2d"):
        da.diag(v, k)


def test_diagonal_zero_chunks():
    x = da.ones((8, 8), chunks=(4, 4))
    dd = da.ones((8, 8), chunks=(4, 4))
    d = da.diagonal(dd)
    expected = np.ones((8,))
    assert_eq(d, expected)
    assert_eq(d + d, 2 * expected)
    assert_eq(d + x, np.full((8, 8), 2.0))


# ---------------------------------------------------------------------------
# tile (reference chunks/neg/zero/empty grids)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape, chunks", [((10,), (1,)), ((10, 11, 13), (4, 5, 3))])
@pytest.mark.parametrize("reps", [2, (2, 3), (3, 2, 5)])
def test_tile_chunks(rng, shape, chunks, reps):
    x = rng.random(shape)
    d = da.from_array(x, chunks=chunks)
    if isinstance(reps, tuple) and len(reps) > len(shape) and len(shape) == 3 and len(reps) == 2:
        return
    try:
        expected = np.tile(x, reps)
    except ValueError:
        return
    assert_eq(expected, da.tile(d, reps))


@pytest.mark.parametrize("shape, chunks", [((10,), (1,)), ((10, 11, 13), (4, 5, 3))])
@pytest.mark.parametrize("reps", [-1, -5])
def test_tile_neg_reps(rng, shape, chunks, reps):
    d = da.from_array(rng.random(shape), chunks=chunks)
    with pytest.raises(ValueError):
        da.tile(d, reps)


@pytest.mark.parametrize("shape, chunks", [((10,), (1,)), ((10, 11, 13), (4, 5, 3))])
@pytest.mark.parametrize("reps", [0, (0,), (2, 0), (0, 3, 0, 4)])
def test_tile_zero_reps(rng, shape, chunks, reps):
    x = rng.random(shape)
    d = da.from_array(x, chunks=chunks)
    assert_eq(np.tile(x, reps), da.tile(d, reps))


@pytest.mark.parametrize("shape, chunks", [((1, 1, 0), (1, 1, 0)), ((2, 0), (1, 0))])
@pytest.mark.parametrize("reps", [2, (3, 2, 5)])
def test_tile_empty_array(shape, chunks, reps):
    x = np.empty(shape)
    d = da.from_array(x, chunks=chunks)
    assert_eq(np.tile(x, reps), da.tile(d, reps))


# ---------------------------------------------------------------------------
# pad (reference full grid + 0-width identity + empty axes + typed values)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode,kwargs", [
    ("constant", {"constant_values": 2}), ("edge", {}),
    ("linear_ramp", {"end_values": 2}), ("reflect", {}),
    ("symmetric", {}), ("wrap", {}), ("empty", {}),
])
def test_pad_0_width_is_identity(rng, mode, kwargs):
    np_a = rng.random((10, 11))
    da_a = da.from_array(np_a, chunks=(4, 5))
    da_r = da.pad(da_a, 0, mode, **kwargs)
    assert da_r is da_a
    assert_eq(np.pad(np_a, 0, mode, **kwargs), da_r)


@pytest.mark.parametrize(
    "shape, chunks, pad_width, mode, kwargs",
    [
        ((10,), (3,), 1, "constant", {}),
        ((10,), (3,), 2, "constant", {"constant_values": -1}),
        ((10,), (3,), 2, "constant", {"constant_values": np.array(-1)}),
        ((10,), (3,), (2, 3), "constant", {"constant_values": (-1, -2)}),
        ((10, 11), (4, 5), ((1, 4), (2, 3)), "constant", {"constant_values": ((-1, -2), (2, 1))}),
        ((10,), (3,), 3, "edge", {}),
        ((10,), (3,), 3, "linear_ramp", {}),
        ((10,), (3,), 3, "linear_ramp", {"end_values": 0}),
        ((10, 11), (4, 5), ((1, 4), (2, 3)), "linear_ramp", {"end_values": ((-1, -2), (4, 3))}),
        ((10, 11), (4, 5), ((1, 4), (2, 3)), "reflect", {}),
        ((10, 11), (4, 5), ((1, 4), (2, 3)), "symmetric", {}),
        ((10, 11), (4, 5), ((1, 4), (2, 3)), "wrap", {}),
        ((10,), (3,), (2, 3), "maximum", {"stat_length": (1, 2)}),
        ((10, 11), (4, 5), ((1, 4), (2, 3)), "mean", {"stat_length": ((3, 4), (2, 1))}),
        ((10,), (3,), (2, 3), "minimum", {"stat_length": (2, 3)}),
    ],
)
def test_pad_grid(rng, shape, chunks, pad_width, mode, kwargs):
    np_a = rng.random(shape)
    da_a = da.from_array(np_a, chunks=chunks)
    np_r = np.pad(np_a, pad_width, mode, **kwargs)
    da_r = da.pad(da_a, pad_width, mode, **kwargs)
    assert_eq(np_r, da_r)


@pytest.mark.parametrize(
    "shape, chunks, pad_width, kwargs",
    [
        ((0,), (0,), (2, 3), {}),
        ((0,), (0,), (2, 3), {"constant_values": 5}),
        ((5, 0), (5, 0), ((1, 2), (2, 3)), {}),
        ((0, 5), (0, 5), ((2, 3), (1, 1)), {"constant_values": 7}),
        ((0, 0), (0, 0), ((2, 3), (1, 4)), {}),
        ((6, 0), (2, 0), ((0, 0), (2, 3)), {}),
    ],
)
def test_pad_empty_array(shape, chunks, pad_width, kwargs):
    np_a = np.ones(shape)
    da_a = da.from_array(np_a, chunks=chunks)
    assert_eq(np.pad(np_a, pad_width, mode="constant", **kwargs),
              da.pad(da_a, pad_width, mode="constant", **kwargs))


@pytest.mark.parametrize(
    ["np_a", "pad_value"],
    [
        (np.arange(4, dtype="int64"), np.int64(1)),
        (np.arange(4, dtype="float64"), np.float64(0)),
        (np.array(["2000-01-01", "2000-01-02", "2000-01-03", "2000-01-04"], dtype="datetime64[ns]"),
         np.datetime64("1972-01-01")),
        (np.array([True, False, True, True], dtype=np.bool_), np.bool_(False)),
        (np.arange(4, dtype="int64"), np.array(1, dtype="int64")),
        (np.arange(4, dtype="float64"), np.array(0, dtype="float64")),
    ],
)
def test_pad_constant_values_typed(np_a, pad_value):
    da_a = da.from_array(np_a, chunks=2)
    np_r = np.pad(np_a, 1, mode="constant", constant_values=pad_value)
    da_r = da.pad(da_a, 1, mode="constant", constant_values=pad_value)
    assert_eq(np_r, da_r)


def test_pad_3d_data(rng):
    np_a = rng.random((6, 7, 8))
    da_a = da.from_array(np_a, chunks=(2, 3, 4))
    for mode in ["constant", "edge", "reflect", "symmetric", "wrap"]:
        assert_eq(np.pad(np_a, ((1, 2), (0, 1), (2, 0)), mode),
                  da.pad(da_a, ((1, 2), (0, 1), (2, 0)), mode))


def test_pad_udf(rng):
    def _udf_pad(vector, pad_width, iaxis, kwargs):
        scaler = kwargs.get("scaler", 1)
        vector[: pad_width[0]] = -scaler * pad_width[0]
        vector[-pad_width[1]:] = scaler * pad_width[1]

    np_a = rng.random((6, 6))
    da_a = da.from_array(np_a, chunks=(3, 3))
    assert_eq(np.pad(np_a, 2, _udf_pad, scaler=2), da.pad(da_a, 2, _udf_pad, scaler=2))


# ---------------------------------------------------------------------------
# auto chunks + string byte chunks (reference validation set)
# ---------------------------------------------------------------------------


def test_auto_chunks_respects_config():
    with config.set({"array.chunk-size": "50 MiB"}):
        x = da.ones((10000, 10000))
        npart = int(np.prod([len(c) for c in x.chunks]))
        assert 4 < npart < 32


@pytest.mark.parametrize("chunks", ["1", "1e6", ("1", "1"), ("-1", "-1")])
def test_string_chunks_require_byte_unit(chunks):
    with pytest.raises(ValueError, match="byte"):
        da.ones((4, 5), chunks=chunks)


@pytest.mark.parametrize("chunks", [("1", "1"), ("1B", "1B")])
def test_1d_explicit_string_chunk_tuples_are_rejected(chunks):
    with pytest.raises(ValueError, match="explicit chunk tuples"):
        da.ones((4,), chunks=chunks)


@pytest.mark.parametrize("chunks", ["-1B", ("-1B", "-1B")])
def test_string_byte_chunks_must_not_be_negative(chunks):
    with pytest.raises(ValueError, match="negative"):
        da.ones((4, 5), chunks=chunks)


@pytest.mark.parametrize("chunks", ["1B", ("1 MiB", "1 MiB")])
def test_string_byte_chunks_accept_units(chunks):
    x = da.ones((4, 5), chunks=chunks)
    assert x.shape == (4, 5)


def test_string_byte_chunks_docstring_example():
    x = da.from_array(np.zeros(2000, dtype="float32"), chunks="1kiB")
    assert x.chunks == ((256,) * 7 + (208,),)


def test_full_string_fill_auto_chunks_computes():
    """The reference raises here (its dtype inference gives itemsize-0 '<U');
    this build infers the SIZED numpy dtype and auto-chunks fine."""
    x = da.full((100, 100), "auto_chunk", chunks="auto")
    assert x.dtype == np.array("auto_chunk").dtype
    assert np.asarray(x[:2, :2].compute()).tolist() == [["auto_chunk"] * 2] * 2


# ---------------------------------------------------------------------------
# nan-chunk *_like (reference test_nan_zeros_ones_like family)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fn", ["zeros_like", "ones_like"])
@pytest.mark.parametrize("shape_chunks", [((50, 4), (10, 2)), ((50,), (10,))])
@pytest.mark.parametrize("dtype", ["u4", np.float32, None, np.int64])
def test_nan_zeros_ones_like(fn, shape_chunks, dtype):
    shape, chunks = shape_chunks
    x = da.ones(shape, chunks=chunks)
    y = x[x[(0,) * (len(shape) - 1)] > 0] if len(shape) == 1 else x[x[:, 0] > 0]
    assert np.isnan(y.shape[0])
    r = getattr(da, fn)(y, dtype=dtype)
    expected = getattr(np, fn)(np.asarray(y.compute()), dtype=dtype)
    got = np.asarray(r.compute())
    assert got.dtype == expected.dtype
    assert np.array_equal(got, expected)


def test_nan_full_like():
    x = da.ones((50, 4), chunks=(10, 2))
    y = x[x[:, 0] > 0]
    r = da.full_like(y, 7, dtype="f8")
    got = np.asarray(r.compute())
    assert got.shape == (50, 4) and (got == 7).all()
