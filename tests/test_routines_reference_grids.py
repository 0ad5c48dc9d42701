"""Routines reference-grid battery.

Ports the heavy parametrized case grids of the reference's
``/root/reference/dask_array/tests/test_routines.py`` — the matmul shape
grid (:321), einsum signature grid (:2585), flip/rot90 grids (:209,:258),
diff prepend/append (:552,:580), ediff1d (:614), gradient varargs grid
(:638), searchsorted grid (:727), the histogram2d/dd family (:931-1193),
ptp (:532) and atleast_nd (:51-90) — re-expressed against this
framework's collection API (values differ; the case *shapes* are the
contract being pinned).
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


@pytest.fixture
def rng():
    return np.random.default_rng(1337)


# ---------------------------------------------------------------------------
# matmul shape grid
# ---------------------------------------------------------------------------

MATMUL_GRID = [
    # (x_shape, y_shape, x_chunks, y_chunks); () chunks -> halves
    ((7,), (7,), None, None),
    ((11,), (11, 7), None, None),
    ((15,), (7, 15, 11), None, None),
    ((19,), (7, 11, 19, 15), None, None),
    ((7, 11), (11,), None, None),
    ((7, 11), (11, 7), None, None),
    ((11, 15), (7, 15, 11), None, None),
    ((15, 19), (7, 11, 19, 15), None, None),
    ((7, 11, 15), (15,), None, None),
    ((7, 11, 15), (15, 7), None, None),
    ((7, 11, 15), (7, 15, 11), None, None),
    ((11, 15, 19), (7, 11, 19, 15), None, None),
    ((7, 11, 15, 19), (19,), None, None),
    ((7, 11, 15, 19), (19, 7), None, None),
    ((7, 11, 15, 19), (11, 19, 13), None, None),
    ((7, 11, 15, 19), (7, 11, 19, 15), None, None),
    # disparate / adversarial chunk splits
    ((7, 11), (11, 7), (1, 1), (1, 1)),
    ((7, 11), (11, 7), (3, 5), (4, 2)),
    ((7, 11), (11, 7), (7, 11), (11, 7)),
    ((11, 15, 19), (7, 11, 19, 15), (7, 7, 7), (3, 9, 9, 9)),
    ((3, 3, 20, 30), (3, 3, 30, 20), (1, 3, 2, 6), (1, 3, 5, 10)),
]


@pytest.mark.parametrize("x_shape,y_shape,x_chunks,y_chunks", MATMUL_GRID)
def test_matmul_grid(rng, x_shape, y_shape, x_chunks, y_chunks):
    x = rng.random(x_shape)
    y = rng.random(y_shape)
    a = da.from_array(x, chunks=x_chunks or tuple(max(1, i // 2) for i in x_shape))
    b = da.from_array(y, chunks=y_chunks or tuple(max(1, i // 2) for i in y_shape))
    assert_eq(da.matmul(a, b), np.matmul(x, y), rtol=1e-9)
    # mixed dask/numpy operands go through the same protocol
    assert_eq(da.matmul(a, y), np.matmul(x, y), rtol=1e-9)
    assert_eq(da.matmul(x, b), np.matmul(x, y), rtol=1e-9)


def test_matmul_scalar_raises(rng):
    a = da.from_array(np.float64(3.0))
    b = da.from_array(rng.random(3), chunks=2)
    with pytest.raises(ValueError):
        da.matmul(a, b)
    with pytest.raises(ValueError):
        da.matmul(b, a)


# ---------------------------------------------------------------------------
# einsum signature grid
# ---------------------------------------------------------------------------

EINSUM_DIMS = {"a": 5, "b": 6, "c": 7, "d": 5, "e": 6, "f": 4, "g": 1, "h": 2, "*": 3}
EINSUM_CHUNKS = {
    "a": (2, 3),
    "b": (2, 3, 1),
    "c": (2, 3, 2),
    "d": (4, 1),
    "e": (2, 4),
    "f": (1, 3),
    "g": 1,
    "h": (1, 1),
    "*": 3,
}

EINSUM_SIGNATURES = [
    "abc,bad->abcd",
    "abcdef,bcdfg->abcdeg",
    "ea,fb,abcd,gc,hd->efgh",
    "ab,b",
    "aa",
    "a,a->",
    "a,a->a",
    "a,a",
    "a,b",
    "a,b,c",
    "a",
    "ba,b",
    "ba,b->",
    "defab,fedbc->defac",
    "ab...,bc...->ac...",
    "a...a",
    "abc...->cba...",
    "...ab->...a",
    "a...a->a...",
    "...abc,...abcd->...d",
    "ab...,b->ab...",
    "aa->a",
    "ab,ab,c->c",
    "aab,bc->ac",
    "aab,bcc->ac",
    "fdf,cdd,ccd,afe->ae",
    "fff,fae,bef,def->abd",
]


@pytest.mark.parametrize("signature", EINSUM_SIGNATURES)
def test_einsum_signature_grid(rng, signature):
    input_sigs = signature.split("->")[0].replace("...", "*").split(",")
    np_inputs = [
        rng.random(tuple(EINSUM_DIMS[c] for c in s)) for s in input_sigs
    ]
    da_inputs = [
        da.from_array(x, chunks=tuple(EINSUM_CHUNKS[c] for c in s))
        for x, s in zip(np_inputs, input_sigs)
    ]
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert_eq(
            da.einsum(signature, *da_inputs),
            np.einsum(signature, *np_inputs),
            rtol=1e-9,
        )


# ---------------------------------------------------------------------------
# flip / rot90 grids
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("funcname,kwargs", [
    ("flipud", {}),
    ("fliplr", {}),
    ("flip", {}),
    ("flip", {"axis": 0}),
    ("flip", {"axis": 1}),
    ("flip", {"axis": 2}),
    ("flip", {"axis": -1}),
    ("flip", {"axis": (0, 2)}),
])
@pytest.mark.parametrize("shape", [(4,), (4, 6), (4, 6, 8), (4, 6, 8, 10)])
def test_flip_grid(rng, funcname, kwargs, shape):
    axis = kwargs.get("axis")
    if axis is None:
        axes = {"flipud": (0,), "fliplr": (1,), "flip": tuple(range(len(shape)))}[funcname]
    else:
        axes = axis if isinstance(axis, tuple) else (axis,)
    x = rng.random(shape)
    d = da.from_array(x, chunks=tuple(max(1, s // 2) for s in shape))
    da_func = getattr(da, funcname)
    valid = all(-len(shape) <= ax < len(shape) for ax in axes)
    if not valid:
        with pytest.raises(ValueError):
            da_func(d, **kwargs).compute()
    else:
        assert_eq(da_func(d, **kwargs), getattr(np, funcname)(x, **kwargs))


@pytest.mark.parametrize("axes", [(0, 1), (1, 0), (1, 2), (0, 2), (2, 0)])
@pytest.mark.parametrize("k", [0, 1, 2, 3, 4, -1])
def test_rot90_grid(rng, axes, k):
    x = rng.random((4, 6, 8))
    d = da.from_array(x, chunks=(2, 3, 4))
    assert_eq(da.rot90(d, k=k, axes=axes), np.rot90(x, k=k, axes=axes))


def test_rot90_invalid_axes(rng):
    d = da.from_array(rng.random((4, 6)), chunks=2)
    with pytest.raises(ValueError):
        da.rot90(d, axes=(0, 0))
    with pytest.raises(ValueError):
        da.rot90(d, axes=(0, 2))


# ---------------------------------------------------------------------------
# diff / ediff1d / gradient
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [0, 1, 2])
def test_diff_prepend_grid(n):
    x = np.arange(5) + 1
    a = da.from_array(x, chunks=2)
    assert_eq(da.diff(a, n, prepend=0), np.diff(x, n, prepend=0))
    assert_eq(da.diff(a, n, prepend=[0]), np.diff(x, n, prepend=[0]))
    assert_eq(da.diff(a, n, prepend=[-1, 0]), np.diff(x, n, prepend=[-1, 0]))

    x2 = np.arange(16).reshape(4, 4)
    a2 = da.from_array(x2, chunks=2)
    assert_eq(da.diff(a2, n, axis=1, prepend=0), np.diff(x2, n, axis=1, prepend=0))
    assert_eq(
        da.diff(a2, n, axis=1, prepend=[[0], [0], [0], [0]]),
        np.diff(x2, n, axis=1, prepend=[[0], [0], [0], [0]]),
    )
    assert_eq(da.diff(a2, n, axis=0, prepend=0), np.diff(x2, n, axis=0, prepend=0))
    assert_eq(
        da.diff(a2, n, axis=0, prepend=[[0, 0, 0, 0]]),
        np.diff(x2, n, axis=0, prepend=[[0, 0, 0, 0]]),
    )
    if n > 0:
        with pytest.raises(ValueError):
            da.diff(a, n, prepend=np.zeros((3, 3)))


@pytest.mark.parametrize("n", [0, 1, 2])
def test_diff_append_grid(n):
    x = np.arange(5) + 1
    a = da.from_array(x, chunks=2)
    assert_eq(da.diff(a, n, append=0), np.diff(x, n, append=0))
    assert_eq(da.diff(a, n, append=[0]), np.diff(x, n, append=[0]))
    assert_eq(da.diff(a, n, append=[-1, 0]), np.diff(x, n, append=[-1, 0]))

    x2 = np.arange(16).reshape(4, 4)
    a2 = da.from_array(x2, chunks=2)
    assert_eq(da.diff(a2, n, axis=1, append=0), np.diff(x2, n, axis=1, append=0))
    assert_eq(da.diff(a2, n, axis=0, append=0), np.diff(x2, n, axis=0, append=0))
    if n > 0:
        with pytest.raises(ValueError):
            da.diff(a, n, append=np.zeros((3, 3)))


def test_diff_negative_order():
    with pytest.raises(ValueError):
        da.diff(da.arange(10), -1)


@pytest.mark.parametrize("shape", [(10,), (10, 15)])
@pytest.mark.parametrize("to_end,to_begin", [(None, None), (0, 0), ([1, 2], [3, 4])])
def test_ediff1d_grid(rng, shape, to_end, to_begin):
    x = rng.integers(0, 10, shape)
    a = da.from_array(x, chunks=(len(shape) * (5,)))
    assert_eq(da.ediff1d(a, to_end, to_begin), np.ediff1d(x, to_end, to_begin))


GRADIENT_GRID = [
    # (shape, varargs_spec, axis); 'coords:<n>' expands to exp coords
    ((10, 15, 20), (), None),
    ((10, 15, 20), (2,), None),
    ((10, 15, 20), (1.0, 1.5, 2.0), None),
    ((10, 15, 20), (), 0),
    ((10, 15, 20), (), 1),
    ((10, 15, 20), (), 2),
    ((10, 15, 20), (), -1),
    ((10, 15, 20), (), (0, 2)),
    ((10, 15, 20), ("coords:10", "coords:20"), (0, 2)),
    ((10, 15, 20), (0.5, "coords:20"), (0, 2)),
    ((10, 15, 20), ("coords:20",), -1),
]


@pytest.mark.parametrize("shape,varargs,axis", GRADIENT_GRID)
@pytest.mark.parametrize("edge_order", [1, 2])
def test_gradient_grid(rng, shape, varargs, axis, edge_order):
    varargs = tuple(
        np.exp(np.arange(int(v.split(":")[1]))) if isinstance(v, str) else v
        for v in varargs
    )
    a = rng.integers(0, 10, shape).astype(np.float64)
    d = da.from_array(a, chunks=(len(shape) * (5,)))
    expected = np.gradient(a, *varargs, axis=axis, edge_order=edge_order)
    got = da.gradient(d, *varargs, axis=axis, edge_order=edge_order)
    if isinstance(expected, list):
        assert len(got) == len(expected)
        for g, e in zip(got, expected):
            assert_eq(g, e, rtol=1e-9)
    else:
        assert_eq(got, expected, rtol=1e-9)


def test_gradient_validation():
    d = da.from_array(np.ones(5), chunks=2)
    with pytest.raises(ValueError):
        da.gradient(d, edge_order=3)
    with pytest.raises(ValueError):
        da.gradient(da.from_array(np.ones(2), chunks=2), edge_order=2)
    with pytest.raises(TypeError):
        da.gradient(da.from_array(np.ones((4, 4)), chunks=2), 1.0, 1.0, 1.0)


# ---------------------------------------------------------------------------
# searchsorted grid
# ---------------------------------------------------------------------------

SEARCHSORTED_GRID = [
    ([], 1, [], 1),
    ([0], 1, [0], 1),
    ([-10, 0, 10, 20, 30], 3, [11, 30], 2),
    ([-10, 0, 10, 20, 30], 3, [11, 30, -20, 1, -10, 10, 37, 11], 5),
    ([-10, 0, 10, 20, 30], 3, [[11, 30, -20, 1, -10, 10, 37, 11]], 5),
    ([-10, 0, 10, 20, 30], 3, [[7, 0], [-10, 10], [11, -1], [15, 15]], (2, 2)),
]


@pytest.mark.parametrize("a,a_chunks,v,v_chunks", SEARCHSORTED_GRID)
@pytest.mark.parametrize("side", ["left", "right"])
def test_searchsorted_grid(a, a_chunks, v, v_chunks, side):
    a = np.array(a)
    v = np.array(v)
    ad = da.asarray(a, chunks=a_chunks)
    vd = da.asarray(v, chunks=v_chunks)
    out = da.searchsorted(ad, vd, side)
    assert out.shape == vd.shape
    assert out.chunks == vd.chunks
    assert_eq(out, np.searchsorted(a, v, side), check_dtype=False)


def test_searchsorted_sorter_works():
    # the reference raises NotImplementedError for sorter=
    # (test_routines.py:741); here it executes and matches numpy.
    out = da.searchsorted(da.asarray([1, 0]), da.asarray([1]), sorter=da.asarray([1, 0]))
    assert_eq(out, np.searchsorted([1, 0], [1], sorter=[1, 0]), check_dtype=False)


# ---------------------------------------------------------------------------
# histogram2d / histogramdd family
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("weighted", [True, False])
@pytest.mark.parametrize("density", [True, False])
@pytest.mark.parametrize("bins", [(5, 6), 5])
def test_histogram2d_grid(rng, weighted, density, bins):
    n = 800
    r = ((0, 1), (0, 1))
    xs = rng.uniform(0, 1, n)
    ys = rng.uniform(0, 1, n)
    ws = rng.uniform(0.2, 1.1, n) if weighted else None
    x = da.from_array(xs, chunks=200)
    y = da.from_array(ys, chunks=200)
    w = da.from_array(ws, chunks=200) if weighted else None
    a1, b1x, b1y = da.histogram2d(x, y, bins=bins, range=r, density=density, weights=w)
    a2, b2x, b2y = np.histogram2d(xs, ys, bins=bins, range=r, density=density, weights=ws)
    assert_eq(a1, a2, rtol=1e-9)
    assert_eq(b1x, b2x, rtol=1e-12)
    assert_eq(b1y, b2y, rtol=1e-12)
    if not (weighted or density):
        assert float(a1.sum().compute()) == n


@pytest.mark.parametrize("weighted", [True, False])
@pytest.mark.parametrize("density", [True, False])
def test_histogram2d_array_bins(rng, weighted, density):
    n = 800
    b = [[0.0, 0.2, 0.6, 0.9, 1.0], [0.0, 0.1, 0.4, 0.5, 1.0]]
    xs = rng.uniform(0, 1, n)
    ys = rng.uniform(0, 1, n)
    ws = rng.uniform(0.2, 1.1, n) if weighted else None
    x = da.from_array(xs, chunks=200)
    y = da.from_array(ys, chunks=200)
    w = da.from_array(ws, chunks=200) if weighted else None
    a1, _, _ = da.histogram2d(x, y, bins=b, density=density, weights=w)
    a2, _, _ = np.histogram2d(xs, ys, bins=b, density=density, weights=ws)
    assert_eq(a1, a2, rtol=1e-9)


def test_histogramdd_basic(rng):
    n = 800
    s = rng.uniform(0, 1, (n, 3))
    d = da.from_array(s, chunks=(200, 3))
    bins = [[0, 0.5, 1], [0, 0.25, 0.85, 1], [0, 0.5, 0.8, 1]]
    a1, b1 = da.histogramdd(d, bins=bins)
    a2, b2 = np.histogramdd(s, bins=bins)
    assert_eq(a1, a2, rtol=1e-9)
    assert float(a1.sum().compute()) == n
    for g, e in zip(b1, b2):
        assert_eq(np.asarray(g), e, rtol=1e-12)


def test_histogramdd_seq_of_arrays(rng):
    n = 800
    cols = [rng.uniform(0, 1, n) for _ in range(3)]
    ds = tuple(da.from_array(c, chunks=200) for c in cols)
    a1, _ = da.histogramdd(ds, bins=(3, 4, 5), range=((0, 1),) * 3)
    a2, _ = np.histogramdd(np.stack(cols, axis=-1), bins=(3, 4, 5), range=((0, 1),) * 3)
    assert_eq(a1, a2, rtol=1e-9)


@pytest.mark.parametrize("density", [True, False])
def test_histogramdd_weighted_density(rng, density):
    n = 800
    s = rng.uniform(0, 1, (n, 2))
    w = rng.uniform(0.5, 2.0, n)
    d = da.from_array(s, chunks=(200, 2))
    dw = da.from_array(w, chunks=200)
    a1, _ = da.histogramdd(d, bins=(4, 5), range=((0, 1), (0, 1)), weights=dw, density=density)
    a2, _ = np.histogramdd(s, bins=(4, 5), range=((0, 1), (0, 1)), weights=w, density=density)
    assert_eq(a1, a2, rtol=1e-9)


def test_histogramdd_beyond_reference(rng):
    s = rng.uniform(0, 1, (100, 2))
    # scalar bins without a range: the reference raises (scalar bins
    # require range, test_routines.py:1172); here the implicit range is a
    # lazy min/max fused into the same program.
    d = da.from_array(s, chunks=(50, 2))
    a1, e1 = da.histogramdd(d, bins=3)
    a2, e2 = np.histogramdd(s, bins=3)
    assert_eq(a1, a2, rtol=1e-9)
    for g, e in zip(e1, e2):
        assert_eq(np.asarray(g), e, rtol=1e-12)
    # column-axis chunking raises in the reference
    # (test_routines.py:1092, incompat sample chunks); here any layout
    # executes.
    d2 = da.from_array(s, chunks=(50, 1))
    a1, _ = da.histogramdd(d2, bins=[[0, 0.5, 1]] * 2)
    a2, _ = np.histogramdd(s, bins=[[0, 0.5, 1]] * 2)
    assert_eq(a1, a2, rtol=1e-9)


def test_histogramdd_scalar_bins_with_range(rng):
    s = rng.uniform(0, 1, (200, 2))
    d = da.from_array(s, chunks=(50, 2))
    a1, e1 = da.histogramdd(d, bins=4, range=((0, 1), (0, 1)))
    a2, e2 = np.histogramdd(s, bins=4, range=((0, 1), (0, 1)))
    assert_eq(a1, a2, rtol=1e-9)
    for g, e in zip(e1, e2):
        assert_eq(np.asarray(g), e, rtol=1e-12)


# ---------------------------------------------------------------------------
# ptp / atleast_nd grids
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,axis", [
    ((10, 15, 20), None),
    ((10, 15, 20), 0),
    ((10, 15, 20), 1),
    ((10, 15, 20), 2),
    ((10, 15, 20), -1),
])
def test_ptp_grid(rng, shape, axis):
    a = rng.integers(0, 10, shape)
    d = da.from_array(a, chunks=(len(shape) * (5,)))
    assert_eq(da.ptp(d, axis), np.ptp(a, axis))


@pytest.mark.parametrize("funcname", ["atleast_1d", "atleast_2d", "atleast_3d"])
def test_atleast_nd_grid(rng, funcname):
    da_func = getattr(da, funcname)
    np_func = getattr(np, funcname)
    # no args -> same empty container as numpy (tuple on numpy >= 2)
    assert da_func() == np_func()
    assert type(da_func()) is type(np_func())
    # one arg of each rank
    for shape in [(), (4,), (4, 6), (4, 6, 8)]:
        x = rng.random(shape)
        d = da.from_array(x, chunks=tuple(max(1, s // 2) for s in shape))
        assert_eq(da_func(d), np_func(x))
    # two args -> same container type as numpy (tuple of results)
    x1, x2 = rng.random((4,)), rng.random((4, 6))
    r = da_func(da.from_array(x1, chunks=2), da.from_array(x2, chunks=2))
    e = np_func(x1, x2)
    assert len(r) == len(e)
    for g, h in zip(r, e):
        assert_eq(g, h)
