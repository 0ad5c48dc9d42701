"""Round-3 routines parity battery, ported from the reference spine
(/root/reference/dask_array/tests/test_routines.py): unique kwargs grids,
einsum signature grid + numpy kwargs, insert/delete/append numpy semantics,
str/object host-lane nonzero family, ravel/unravel index contracts, roll
grid, result_type, and graph pickling of vectorized routines."""

import pickle
import warnings

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


@pytest.fixture
def rng():
    return np.random.default_rng(11)


# ---------------------------------------------------------------------------
# unique / isin (reference test_unique_kwargs / test_unique_rand / test_isin_*)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("return_index", [False, True])
@pytest.mark.parametrize("return_inverse", [False, True])
@pytest.mark.parametrize("return_counts", [False, True])
def test_unique_kwargs(return_index, return_inverse, return_counts):
    kwargs = dict(
        return_index=return_index,
        return_inverse=return_inverse,
        return_counts=return_counts,
    )
    a = np.array([1, 2, 4, 4, 5, 2])
    d = da.from_array(a, chunks=(3,))
    r_a = np.unique(a, **kwargs)
    r_d = da.unique(d, **kwargs)
    if not any([return_index, return_inverse, return_counts]):
        assert isinstance(r_a, np.ndarray)
        assert isinstance(r_d, da.Array)
        r_a, r_d = (r_a,), (r_d,)
    assert len(r_a) == len(r_d)
    if return_inverse:
        i = 1 + int(return_index)
        assert (d.size,) == r_d[i].shape
    for e_a, e_d in zip(r_a, r_d):
        got = np.asarray(e_d.compute())
        assert np.array_equal(got.ravel(), np.asarray(e_a).ravel())


@pytest.mark.parametrize("shape, chunks", [[(10,), (5,)], [(10,), (3,)], [(4, 5), (3, 2)], [(20, 20), (4, 5)]])
def test_unique_rand_grid(rng, shape, chunks):
    a = rng.integers(0, 10, size=shape)
    d = da.from_array(a, chunks=chunks)
    r_a = np.unique(a, return_index=True, return_inverse=True, return_counts=True)
    r_d = da.unique(d, return_index=True, return_inverse=True, return_counts=True)
    for e_a, e_d in zip(r_a, r_d):
        got = np.asarray(e_d.compute())
        assert np.array_equal(got.ravel(), np.asarray(e_a).ravel())


@pytest.mark.parametrize("invert", [True, False])
def test_isin_rand(rng, invert):
    a1 = rng.integers(0, 10, size=(4, 5))
    d1 = da.from_array(a1, chunks=(3, 2))
    a2 = rng.integers(0, 10, size=(20, 20)) - 5
    d2 = da.from_array(a2, chunks=(4, 5))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert_eq(np.isin(a1, a2, invert=invert), da.isin(d1, d2, invert=invert))


@pytest.mark.parametrize("assume_unique", [True, False])
def test_isin_assume_unique(assume_unique):
    a1 = np.arange(10)
    d1 = da.from_array(a1, chunks=(5,))
    t = np.arange(0, 10, 2)
    assert_eq(np.isin(a1, t, assume_unique=assume_unique), da.isin(d1, t, assume_unique=assume_unique))


# ---------------------------------------------------------------------------
# roll (reference test_roll family)
# ---------------------------------------------------------------------------


def _maybe_len(x):
    try:
        return len(x)
    except TypeError:
        return 0


@pytest.mark.parametrize("chunks", [(4, 6), (2, 6)])
@pytest.mark.parametrize("shift", [3, 7, 9, (3, 9), (7, 2)])
@pytest.mark.parametrize("axis", [None, 0, 1, -1, (0, 1), (1, 0)])
def test_roll_grid(rng, chunks, shift, axis):
    x = rng.integers(10, size=(4, 6))
    a = da.from_array(x, chunks=chunks)
    if _maybe_len(shift) != _maybe_len(axis):
        with pytest.raises((TypeError, ValueError)):
            da.roll(a, shift, axis)
    else:
        assert_eq(np.roll(x, shift, axis), da.roll(a, shift, axis))


def test_roll_always_new_array_and_zero_shape():
    x = da.arange(2, 3)
    assert da.roll(x, 1) is not x
    assert_eq(np.roll(np.zeros(0), 0), da.roll(da.zeros(0), 0))


# ---------------------------------------------------------------------------
# result_type (reference test_result_type)
# ---------------------------------------------------------------------------


def test_result_type_scalars_and_zero_d():
    a = da.from_array(np.ones(5, np.float32), chunks=(3,))
    b = da.from_array(np.ones(5, np.int16), chunks=(3,))
    c = da.from_array(np.ones(5, np.int64), chunks=(3,))
    x = np.ones(5, np.float32)
    assert da.result_type(b, c) == np.int64
    assert da.result_type(a, b, c) == np.float64
    assert da.result_type(b, np.float32) == np.float32
    assert da.result_type(b, np.dtype(np.float32)) == np.float32
    assert da.result_type(b, x) == np.float32
    assert da.result_type(1, b) == np.int16
    assert da.result_type(1.0, a) == np.float32
    assert da.result_type(np.int64(1), b) == np.int64
    assert da.result_type(np.ones((), np.int64), b) == np.int64
    assert da.result_type(1e200, a) == np.float32
    c0 = da.from_array(np.ones((), np.float64), chunks=())
    assert da.result_type(a, c0) == np.float64


# ---------------------------------------------------------------------------
# einsum (reference test_einsum grid + kwargs)
# ---------------------------------------------------------------------------

_EINSUM_DIMS = {"a": 5, "b": 6, "c": 7, "d": 5, "e": 6, "f": 10, "g": 1, "h": 2, "*": 11}
_EINSUM_CHUNKS = {"a": (2, 3), "b": (2, 3, 1), "c": (2, 3, 2), "d": (4, 1), "e": (2, 4),
                  "f": (1, 2, 3, 4), "g": 1, "h": (1, 1), "*": 11}


@pytest.mark.parametrize("sig", [
    "abc,bad->abcd", "abcdef,bcdfg->abcdeg", "ea,fb,abcd,gc,hd->efgh",
    "ab,b", "aa", "a,a->", "a,a->a", "a,a", "a,b", "a,b,c", "a",
    "ba,b", "ba,b->", "defab,fedbc->defac", "ab...,bc...->ac...",
    "a...a", "abc...->cba...", "...ab->...a", "a...a->a...",
    "...abc,...abcd->...d", "ab...,b->ab...", "aa->a", "ab,ab,c->c",
    "aab,bc->ac", "aab,bcc->ac", "fdf,cdd,ccd,afe->ae", "fff,fae,bef,def->abd",
])
def test_einsum_signature_grid(rng, sig):
    input_sigs = sig.split("->")[0].replace("...", "*").split(",")
    np_in = [rng.random(tuple(_EINSUM_DIMS[ch] for ch in s)) for s in input_sigs]
    da_in = [da.from_array(x, chunks=tuple(_EINSUM_CHUNKS[ch] for ch in s))
             for x, s in zip(np_in, input_sigs)]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert_eq(np.einsum(sig, *np_in), da.einsum(sig, *da_in), rtol=1e-10)


@pytest.mark.parametrize("opt", [True, False, "greedy", "optimal"])
def test_einsum_optimize(rng, opt):
    a, b = rng.random((5, 6)), rng.random((6, 7))
    dda, ddb = da.from_array(a, chunks=(2, 3)), da.from_array(b, chunks=(3, 4))
    assert_eq(np.einsum("ab,bc->ac", a, b, optimize=opt),
              da.einsum("ab,bc->ac", dda, ddb, optimize=opt), rtol=1e-10)


@pytest.mark.parametrize("order", ["C", "F", "A", "K"])
def test_einsum_order(rng, order):
    a, b = rng.random((5, 6)), rng.random((6, 7))
    dda, ddb = da.from_array(a, chunks=(2, 3)), da.from_array(b, chunks=(3, 4))
    assert_eq(np.einsum("ab,bc->ac", a, b, order=order),
              da.einsum("ab,bc->ac", dda, ddb, order=order), rtol=1e-10)


@pytest.mark.parametrize("casting", ["no", "equiv", "safe", "same_kind", "unsafe"])
def test_einsum_casting(rng, casting):
    a, b = rng.random((5, 6)), rng.random((6, 7))
    dda, ddb = da.from_array(a, chunks=(2, 3)), da.from_array(b, chunks=(3, 4))
    assert_eq(np.einsum("ab,bc->ac", a, b, casting=casting),
              da.einsum("ab,bc->ac", dda, ddb, casting=casting), rtol=1e-10)


def test_einsum_casting_gates_explicit_dtype(rng):
    a = da.from_array(rng.random((4, 4)), chunks=2)
    with pytest.raises(TypeError):
        da.einsum("ab->a", a, dtype=np.int32, casting="safe")
    # unsafe allows it
    out = da.einsum("ab->a", a, dtype=np.int32, casting="unsafe")
    assert out.dtype == np.int32


@pytest.mark.parametrize("split_every", [None, 2, 4])
def test_einsum_split_every(rng, split_every):
    a, b = rng.random((5, 6)), rng.random((6, 7))
    dda, ddb = da.from_array(a, chunks=(2, 3)), da.from_array(b, chunks=(3, 4))
    assert_eq(np.einsum("ab,bc->ac", a, b),
              da.einsum("ab,bc->ac", dda, ddb, split_every=split_every), rtol=1e-10)


def test_einsum_invalid_args(rng):
    a = da.from_array(rng.random((4, 4)), chunks=2)
    with pytest.raises(ValueError):
        da.einsum("ab->a", a, order="Q")
    with pytest.raises(ValueError):
        da.einsum("ab->a", a, casting="bogus")


def test_einsum_broadcasting_contraction(rng):
    a = rng.random((1, 5, 4))
    b = rng.random((4, 6))
    c = rng.random((5, 6))
    d_ = rng.random((10,))
    da_a = da.from_array(a, chunks=(1, (2, 3), (2, 2)))
    da_b = da.from_array(b, chunks=((2, 2), (4, 2)))
    da_c = da.from_array(c, chunks=((2, 3), (4, 2)))
    da_d = da.from_array(d_, chunks=5)
    assert_eq(np.einsum("ijk,kl,jl", a, b, c), da.einsum("ijk,kl,jl", da_a, da_b, da_c), rtol=1e-10)
    assert_eq(np.einsum("ijk,kl,jl,i->i", a, b, c, d_),
              da.einsum("ijk,kl,jl,i->i", da_a, da_b, da_c, da_d), rtol=1e-10)
    assert_eq(np.einsum("...jk,...kl,...jl", a, b, c),
              da.einsum("...jk,...kl,...jl", da_a, da_b, da_c), rtol=1e-10)


def test_einsum_empty_dimension(rng):
    a = rng.random((0, 5))
    d = da.from_array(a, chunks=((0,), (5,)))
    assert_eq(np.einsum("ab->b", a), da.einsum("ab->b", d))


def test_tensordot_more_than_26_dims():
    ndim = 27
    x = np.broadcast_to(1, [2] * ndim)
    dx = da.from_array(x, chunks=-1)
    assert_eq(da.tensordot(dx, dx, ndim), np.tensordot(x, x, ndim))


# ---------------------------------------------------------------------------
# insert / delete / append (reference test_insert / test_multi_insert / ...)
# ---------------------------------------------------------------------------


def test_insert_reference_spine(rng):
    x = rng.integers(10, size=(10, 10))
    a = da.from_array(x, chunks=(5, 5))
    y = rng.integers(10, size=(5, 10))
    b = da.from_array(y, chunks=(4, 4))

    assert_eq(np.insert(x, 0, -1, axis=0), da.insert(a, 0, -1, axis=0))
    assert_eq(np.insert(x, 3, -1, axis=-1), da.insert(a, 3, -1, axis=-1))
    assert_eq(np.insert(x, 5, -1, axis=1), da.insert(a, 5, -1, axis=1))
    assert_eq(np.insert(x, -1, -1, axis=-2), da.insert(a, -1, -1, axis=-2))
    assert_eq(np.insert(x, [2, 3, 3], -1, axis=1), da.insert(a, [2, 3, 3], -1, axis=1))
    assert_eq(np.insert(x, [2, 3, 8, 8, -2, -2], -1, axis=0),
              da.insert(a, [2, 3, 8, 8, -2, -2], -1, axis=0))
    assert_eq(np.insert(x, slice(1, 4), -1, axis=1), da.insert(a, slice(1, 4), -1, axis=1))
    assert_eq(np.insert(x, [2] * 3 + [5] * 2, y, axis=0),
              da.insert(a, [2] * 3 + [5] * 2, b, axis=0))
    assert_eq(np.insert(x, 0, y[0], axis=1), da.insert(a, 0, b[0], axis=1))
    # numpy's size-1 branch: the whole values block goes in at the position
    assert_eq(np.insert(x, [5], y, axis=0), da.insert(a, [5], b, axis=0))
    assert_eq(np.insert(x, 5, y, axis=0), da.insert(a, 5, b, axis=0))
    assert_eq(np.insert(x, [5] * 5, 7, axis=0), da.insert(a, [5] * 5, 7, axis=0))

    # stable names (content-addressed determinism)
    n1 = da.insert(a, [2, 3, 8, 8, -2, -2], -1, axis=0).expr._name
    n2 = da.insert(a, [2, 3, 8, 8, -2, -2], -1, axis=0).expr._name
    assert n1 == n2

    with pytest.raises(Exception):
        da.insert(a, [3], -1, axis=2)
    with pytest.raises(Exception):
        da.insert(a, [3], -1, axis=-3)
    with pytest.raises(IndexError):
        da.insert(a, 11, -1, axis=0)


def test_multi_insert(rng):
    z = rng.integers(10, size=(1, 2))
    c = da.from_array(z, chunks=(1, 2))
    assert_eq(
        np.insert(np.insert(z, [0, 1], -1, axis=0), [1], -1, axis=1),
        da.insert(da.insert(c, [0, 1], -1, axis=0), [1], -1, axis=1),
    )


def test_delete_grid(rng):
    x = rng.integers(10, size=(10, 10))
    a = da.from_array(x, chunks=(5, 5))
    for obj, axis in [(0, 0), (3, 0), (3, 1), (-1, 1), (-4, 1),
                      ([2, 3, 3], 1), ([2, 3, 8, 8], 1),
                      (slice(1, 4), 1), (slice(1, 10, 2), 1)]:
        assert_eq(np.delete(x, obj, axis=axis), da.delete(a, obj, axis=axis))


def test_append_grid(rng):
    x = rng.integers(10, size=(10, 10))
    a = da.from_array(x, chunks=(5, 5))
    y0 = rng.integers(10, size=(5, 10))
    b0 = da.from_array(y0, chunks=(4, 4))
    y1 = rng.integers(10, size=(10, 5))
    b1 = da.from_array(y1, chunks=(4, 4))
    assert_eq(np.append(x, y0, axis=0), da.append(a, b0, axis=0))
    assert_eq(np.append(x, y0, axis=-2), da.append(a, b0, axis=-2))
    assert_eq(np.append(x, y1, axis=1), da.append(a, b1, axis=1))
    assert_eq(np.append(x, y1, axis=-1), da.append(a, b1, axis=-1))
    assert_eq(np.append(x, x, axis=None), da.append(a, a, axis=None))
    assert_eq(np.append(x, ((0,) * 10,) * 10, axis=0), da.append(a, ((0,) * 10,) * 10, axis=0))
    with pytest.raises(Exception):
        da.append(a, ((0,) * 10,) * 10, axis=2)
    with pytest.raises(ValueError):
        da.append(a, (0,) * 10, axis=0)


# ---------------------------------------------------------------------------
# str / object host lane (reference test_count_nonzero_str/_obj, argwhere)
# ---------------------------------------------------------------------------


def test_count_nonzero_str():
    x = np.array(list("Hello world"))
    d = da.from_array(x, chunks=(4,))
    assert np.count_nonzero(x) == int(da.count_nonzero(d).compute())


@pytest.mark.parametrize("axis", [None, 0, (1,), (0, 1)])
def test_count_nonzero_obj_axis(rng, axis):
    x = rng.integers(10, size=(15, 16)).astype(object)
    d = da.from_array(x, chunks=(4, 5))
    x_c = np.count_nonzero(x, axis)
    d_c = da.count_nonzero(d, axis)
    if d_c.shape == ():
        assert x_c == int(d_c.compute())
    else:
        assert_eq(np.asarray(x_c, dtype=np.intp), d_c, check_dtype=False)


def test_argwhere_str():
    x = np.array(list("Hello world"))
    d = da.from_array(x, chunks=(4,))
    assert_eq(da.argwhere(d), np.argwhere(x), check_dtype=False)


def test_pickle_vectorized_routines():
    """Graphs over str host-lane arrays pickle (reference pins this)."""
    a = da.from_array(np.array(["foo", "bar", ""]))
    b = da.count_nonzero(a)
    assert int(b.compute()) == 2
    b2 = pickle.loads(pickle.dumps(b))
    assert int(b2.compute()) == 2
    c = da.argwhere(a)
    c2 = pickle.loads(pickle.dumps(c))
    assert_eq(c2, np.array([[0], [1]]), check_dtype=False)


def test_pickle_fix_i0_isposinf(rng):
    x = rng.random(10)
    d = da.from_array(x, chunks=5)
    assert_eq(pickle.loads(pickle.dumps(da.fix(d))), np.fix(x))
    assert_eq(pickle.loads(pickle.dumps(da.i0(d))), np.i0(x), rtol=1e-6)
    assert_eq(pickle.loads(pickle.dumps(da.isposinf(d))), np.isposinf(x))
    assert_eq(pickle.loads(pickle.dumps(da.isneginf(-d))), np.isneginf(-x))


# ---------------------------------------------------------------------------
# ravel_multi_index / unravel_index (reference test_ravel_multi_index family)
# ---------------------------------------------------------------------------


def test_ravel_multi_index_array_and_modes(rng):
    mi = np.array([[3, 6, 6], [4, 5, 1]])
    d = da.from_array(mi, chunks=(2, 2))
    assert_eq(da.ravel_multi_index(d, dims=(7, 6)), np.ravel_multi_index(mi, dims=(7, 6)), check_dtype=False)
    assert_eq(da.ravel_multi_index(d, dims=(7, 6), order="F"),
              np.ravel_multi_index(mi, dims=(7, 6), order="F"), check_dtype=False)
    assert_eq(da.ravel_multi_index(d, dims=(4, 6), mode="wrap"),
              np.ravel_multi_index(mi, dims=(4, 6), mode="wrap"), check_dtype=False)
    assert_eq(da.ravel_multi_index(d, dims=(4, 6), mode="clip"),
              np.ravel_multi_index(mi, dims=(4, 6), mode="clip"), check_dtype=False)


def test_ravel_multi_index_sequence_and_scalars(rng):
    seq = [rng.integers(4, size=(5,)), rng.integers(4, size=(5,))]
    dseq = [da.from_array(m, chunks=2) for m in seq]
    assert_eq(da.ravel_multi_index(dseq, dims=(4, 4)),
              np.ravel_multi_index(seq, dims=(4, 4)), check_dtype=False)
    assert_eq(da.ravel_multi_index((2, 1), (5, 10)),
              np.ravel_multi_index((2, 1), (5, 10)), check_dtype=False)


def test_ravel_multi_index_unknown_shape():
    multi_index = da.from_array(np.array([[3, 6, 6], [4, 5, 1], [-1, -1, -1]]))
    multi_index = multi_index[(multi_index > 0).all(axis=1)]
    assert np.isnan(multi_index.shape).any()
    expected = np.ravel_multi_index(np.array([[3, 6, 6], [4, 5, 1]]), dims=(7, 6))
    got = np.asarray(da.ravel_multi_index(multi_index, dims=(7, 6)).compute())
    assert np.array_equal(got, expected)


def test_ravel_multi_index_unknown_shape_sequence_fails():
    m1 = da.from_array(np.array([2, -1, 3, -1]), chunks=2)
    m1 = m1[m1 > 0]
    m2 = da.from_array(np.array([[1, 2], [3, 4], [5, 6], [7, 8]]), chunks=(2, 1))
    m2 = m2[(m2 > 0).all(axis=1)]
    with pytest.raises(ValueError, match="[Cc]hunk"):
        da.ravel_multi_index([1, m1, m2], dims=(8, 9, 10))


def test_ravel_multi_index_dask_dims_raises():
    with pytest.raises(NotImplementedError, match="Dask types are not supported"):
        da.ravel_multi_index((2, 1), da.from_array(np.array([5, 10])))
    with pytest.raises(NotImplementedError, match="Dask types are not supported"):
        d = da.from_array(np.array([5, 10]))
        da.ravel_multi_index((2, 1), [d[0], d[1]])


def test_ravel_multi_index_non_int_dtype():
    with pytest.raises(TypeError, match="only int indices permitted"):
        da.ravel_multi_index((1.0, 2), (5, 10))


def test_ravel_multi_index_mode_raise_raises_out_of_bounds():
    mi = np.array([[3, 9, 6], [4, 5, 1]])
    d = da.from_array(mi, chunks=(2, 2))
    with pytest.raises(ValueError):
        da.ravel_multi_index(d, dims=(7, 6)).compute()


@pytest.mark.parametrize("order", ["C", "F"])
@pytest.mark.parametrize("nindices, shape", [(0, (15,)), (1, (15,)), (3, (15,)), (2, (15, 16))])
def test_unravel_index_grid(rng, nindices, shape, order):
    arr = rng.integers(int(np.prod(shape)), size=nindices)
    d = da.from_array(arr, chunks=1)
    expected = np.unravel_index(arr, shape, order=order)
    actual = da.unravel_index(d, shape, order=order)
    assert len(expected) == len(actual)
    for a_, b_ in zip(actual, expected):
        got = np.asarray(a_.compute())
        assert np.array_equal(got.ravel(), np.asarray(b_).ravel())


def test_unravel_index_empty_shape():
    indices = np.unravel_index(np.array(0, dtype=int), ())
    d_indices = da.unravel_index(da.from_array(np.array(0, dtype=int), chunks=1), ())
    assert isinstance(d_indices, type(indices))
    assert len(d_indices) == len(indices) == 0


# ---------------------------------------------------------------------------
# coarsen contract (reference test_coarsen_with_excess / test_coarsen_bad_chunks)
# ---------------------------------------------------------------------------


def test_coarsen_shape_indivisible_raises():
    with pytest.raises(ValueError):
        da.coarsen(np.sum, da.arange(10, chunks=5), {0: 4})


def test_coarsen_bad_chunks_rechunks():
    x1 = da.arange(48, chunks=5)
    x2 = x1.rechunk((16, 16, 16))
    assert_eq(
        da.coarsen(np.sum, x1, {0: 10}, trim_excess=True),
        da.coarsen(np.sum, x2, {0: 10}, trim_excess=True),
    )


# ---------------------------------------------------------------------------
# misc (reference test_where_*, test_choose, test_compress, test_extract, ...)
# ---------------------------------------------------------------------------


def test_where_bool_scalar_condition(rng):
    x = rng.integers(10, size=(15, 16))
    y = rng.integers(10, size=(15, 16))
    d = da.from_array(x, chunks=(4, 5))
    e = da.from_array(y, chunks=(4, 5))
    for c in [True, False, np.True_, np.False_, 1, 0]:
        assert_eq(da.where(c, d, e), np.where(c, x, y))


def test_where_incorrect_args():
    a = da.ones(5, chunks=3)
    for kwd in ["x", "y"]:
        with pytest.raises(ValueError, match="either both or neither"):
            da.where(a > 0, **{kwd: a})


def test_choose_grid(rng):
    x = rng.integers(0, 3, size=(10, 10))
    d = da.from_array(x, chunks=(4, 5))
    assert_eq(np.choose(x, [-x, x + 1, x + 2]), da.choose(d, [-d, d + 1, d + 2]))


def test_compress_grid(rng):
    x = np.arange(25).reshape((5, 5))
    a = da.from_array(x, chunks=(2, 2))
    c1 = np.array([True, False, True, False, True])
    for c, axis in [(c1, 0), (c1, 1), ([True, False], 0), ([True, False], 1)]:
        assert_eq(np.compress(c, x, axis=axis), da.compress(c, a, axis=axis))
    assert_eq(np.compress(c1, x), da.compress(c1, a))
    dc = da.from_array(c1, chunks=3)
    assert_eq(np.compress(c1, x, axis=0), da.compress(dc, a, axis=0))


def test_extract_grid(rng):
    x = np.arange(25).reshape((5, 5))
    a = da.from_array(x, chunks=(2, 2))
    cond = x % 2 == 0
    dcond = da.from_array(cond, chunks=(2, 2))
    assert_eq(np.extract(cond, x), da.extract(dcond, a))
    assert_eq(np.extract(cond.ravel(), x), da.extract(cond.ravel(), a))


def test_take_dask_from_numpy():
    x = np.arange(5).astype("f8")
    index = da.from_array(np.array([1, 2, 3]), chunks=2)
    assert_eq(da.take(x, index), np.array([1.0, 2.0, 3.0]))


def test_stack_unknown_chunksizes_flag(rng):
    a = da.ones((10, 10), chunks=5)
    mask = da.ones(10, chunks=5) > 0.5
    z = a[mask]  # unknown on axis 0
    # nan ON the concat axis is fine without the flag (boolean-index concat)
    assert_eq(da.vstack([z, z]), np.ones((20, 10)))
    # nan OFF the concat axis requires explicit opt-in (reference parity)
    with pytest.raises(ValueError):
        da.hstack([z, z])
    out = da.hstack([z, z], allow_unknown_chunksizes=True)
    assert_eq(out, np.ones((10, 20)))
    zt = z.T  # unknown on axis 1
    with pytest.raises(ValueError):
        da.vstack([zt, zt])
    assert_eq(da.vstack([zt, zt], allow_unknown_chunksizes=True), np.ones((20, 10)))


def test_iscomplexobj():
    assert da.iscomplexobj(da.from_array(np.array([1, 2]), chunks=2)) is False
    assert da.iscomplexobj(da.from_array(np.array([1, 2 + 0j]), chunks=2)) is True
