"""Lazy fancy indexing: int-dask-array slicing and lazy vindex.

VERDICT round-1 item 4 (parity: ``slicing/_basic.py:75,125``,
``slicing/_vindex.py:31,143``): ``x[lazy_idx]`` and
``x.vindex[lazy_i, lazy_j]`` must compute WITHOUT materializing the index
arrays at graph-build time — index shapes are metadata, values stay lazy.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def _no_eager_compute(monkeypatch):
    import dask_array_tpu._materialize as mat

    calls = []
    orig = mat.compute_expr

    def spy(expr, optimize=True):
        calls.append(expr)
        return orig(expr, optimize)

    monkeypatch.setattr(mat, "compute_expr", spy)
    return calls


def test_int_lazy_array_slicing_1d(rng, monkeypatch):
    calls = _no_eager_compute(monkeypatch)
    x = rng.standard_normal((40,))
    idx = np.array([3, 7, 1, 39, 0, 25])
    d = da.from_array(x, chunks=10)
    di = da.from_array(idx, chunks=3)
    out = d[di]
    assert calls == []  # graph build materialized nothing
    assert out.shape == (6,)
    assert_eq(out, x[idx])


def test_int_lazy_array_slicing_negative(rng):
    x = rng.standard_normal((20,))
    idx = np.array([-1, -20, 5])
    d = da.from_array(x, chunks=5)
    di = da.from_array(idx, chunks=2)
    assert_eq(d[di], x[idx])


def test_int_lazy_array_slicing_2d_index(rng):
    x = rng.standard_normal((30,))
    idx = np.array([[0, 2], [5, 29], [7, 7]])
    d = da.from_array(x, chunks=10)
    di = da.from_array(idx, chunks=(2, 1))
    out = d[di]
    assert out.shape == (3, 2)
    assert_eq(out, x[idx])


def test_int_lazy_array_slicing_axis1(rng):
    x = rng.standard_normal((8, 24))
    idx = np.array([23, 0, 11, 4])
    d = da.from_array(x, chunks=(4, 6))
    di = da.from_array(idx, chunks=2)
    assert_eq(d[:, di], x[:, idx])


def test_lazy_index_from_computation(rng):
    # the index itself is a lazy computation (argsort-like pipeline)
    x = rng.standard_normal((16,))
    d = da.from_array(x, chunks=4)
    order = da.from_array(np.array([15, 14, 1, 0]), chunks=2)
    out = d[order * 1]  # elemwise keeps it lazy
    assert_eq(out, x[[15, 14, 1, 0]])


# -- lazy vindex --------------------------------------------------------------


def test_vindex_lazy_pair(rng, monkeypatch):
    calls = _no_eager_compute(monkeypatch)
    x = rng.standard_normal((12, 10))
    i = np.array([0, 11, 3, 3])
    j = np.array([9, 0, 2, 5])
    d = da.from_array(x, chunks=(4, 5))
    di = da.from_array(i, chunks=2)
    dj = da.from_array(j, chunks=2)
    out = d.vindex[di, dj]
    assert calls == []
    assert out.shape == (4,)
    assert_eq(out, x[i, j])


def test_vindex_lazy_with_slice(rng):
    x = rng.standard_normal((6, 8, 4))
    i = np.array([5, 0, 2])
    k = np.array([3, 1, 0])
    d = da.from_array(x, chunks=(3, 4, 2))
    out = d.vindex[da.from_array(i, chunks=2), :, da.from_array(k, chunks=2)]
    # vindex contract: broadcast dims LEAD even when arrays are separated
    expected = x[i, :, k]  # numpy moves broadcast dims first here too
    assert out.shape == expected.shape
    assert_eq(out, expected)


def test_vindex_eager_separated_leads(rng):
    # eager-index version of the separated-arrays contract
    x = rng.standard_normal((6, 8, 4))
    d = da.from_array(x, chunks=(3, 4, 2))
    i = np.array([1, 5])
    k = np.array([0, 3])
    out = d.vindex[i, :, k]
    assert_eq(out, x[i, :, k])


def test_vindex_trailing_slice_leads(rng):
    # single index array + trailing slice: vindex puts broadcast dims FIRST
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    j = np.array([7, 0, 3])
    out = d.vindex[:, j]
    # dask vindex semantics: result is (len(j), 6) — index dims lead
    expected = x[:, j].T
    assert out.shape == expected.shape
    assert_eq(out, expected)


def test_vindex_lazy_negative_indices(rng):
    x = rng.standard_normal((10, 10))
    d = da.from_array(x, chunks=5)
    i = da.from_array(np.array([-1, -10]), chunks=1)
    j = da.from_array(np.array([0, -5]), chunks=1)
    assert_eq(d.vindex[i, j], x[[-1, -10], [0, -5]])


def test_vindex_lazy_broadcast(rng):
    x = rng.standard_normal((9, 7))
    d = da.from_array(x, chunks=(3, 7))
    i = da.from_array(np.array([[0], [8], [4]]), chunks=(2, 1))  # (3,1)
    j = da.from_array(np.array([6, 0]), chunks=1)  # (2,)
    out = d.vindex[i, j]
    assert out.shape == (3, 2)
    assert_eq(out, x[np.array([[0], [8], [4]]), np.array([6, 0])])


def test_vindex_lazy_bool_raises(rng):
    d = da.from_array(rng.standard_normal((4, 4)), chunks=2)
    m = da.from_array(np.array([True, False, True, False]), chunks=2)
    with pytest.raises(NotImplementedError, match="BOOLEAN"):
        d.vindex[m, m]


def test_vindex_all_slices_is_identity(rng):
    x = rng.standard_normal((4, 4))
    d = da.from_array(x, chunks=2)
    assert_eq(d.vindex[:, :], x)


def test_vindex_out_of_bounds_eager():
    d = da.from_array(np.arange(10.0), chunks=5)
    with pytest.raises(IndexError):
        d.vindex[np.array([11])]


def test_vindex_on_mesh(rng):
    import jax
    from jax.sharding import Mesh

    from dask_array_tpu.parallel import use_mesh

    devs = np.asarray(jax.devices("cpu")[:8])
    mesh = Mesh(devs, ("r",))
    x = rng.standard_normal((64, 16))
    d = da.from_array(x, chunks=(8, 16))
    i = da.from_array(np.array([63, 0, 32, 5]), chunks=2)
    j = da.from_array(np.array([15, 3, 8, 0]), chunks=2)
    out = d.vindex[i, j]
    with use_mesh(mesh):
        assert_eq(out, x[[63, 0, 32, 5], [15, 3, 8, 0]])


# -- multiple advanced indices in __getitem__ (capability extension: the
# -- reference raises here and suggests .vindex) ------------------------------


class TestMultiFancyGetitem:
    def setup_method(self):
        self.rng = np.random.default_rng(0)
        self.x = self.rng.standard_normal((7, 8, 9))
        self.d = da.from_array(self.x, chunks=(3, 4, 5))

    def check(self, idx):
        ref = self.x[idx]
        got = np.asarray(self.d[idx].compute())
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref)

    def test_two_arrays_consecutive(self):
        self.check((np.array([0, 2, 5]), np.array([1, 3, 7])))

    def test_arrays_separated_broadcast_leads(self):
        self.check((np.array([0, 2]), slice(None), np.array([1, 3])))

    def test_broadcasting_2d_indices(self):
        self.check((np.array([[0, 2], [1, 3]]), np.array([[1], [5]])))

    def test_array_plus_scalar_int(self):
        self.check((np.array([0, 2, 5]), 3))
        self.check((np.array([0, 2]), slice(None), 4))

    def test_leading_slice_inplace_broadcast(self):
        self.check((slice(1, 6), np.array([0, 2]), np.array([1, 1])))
        self.check((slice(None), np.array([0, 2]), np.array([1, 1])))
        self.check((slice(2, 7, 2), np.array([1, 2]), np.array([0, 0])))

    def test_boolean_among_advanced(self):
        mask = np.array([True, False, True, False, True, False, True])
        self.check((mask, np.array([0, 1, 2, 3])))

    def test_negative_indices(self):
        self.check((np.array([-1, -7]), np.array([0, 1])))

    def test_lazy_index_pair(self):
        li = da.from_array(np.array([0, 2, 5]), chunks=2)
        lj = da.from_array(np.array([1, 3, 7]), chunks=2)
        ref = self.x[np.array([0, 2, 5]), np.array([1, 3, 7])]
        got = np.asarray(self.d[li, lj].compute())
        np.testing.assert_allclose(got, ref)

    def test_out_of_bounds_raises(self):
        with pytest.raises(IndexError):
            self.d[np.array([0, 99]), np.array([1, 2])]

    def test_mismatched_broadcast_raises(self):
        with pytest.raises(ValueError):
            self.d[np.array([0, 1, 2]), np.array([0, 1])]


def test_lazy_index_arithmetic_bounds_check_uses_transformed_values():
    """a[i - k] must not bounds-check the RAW leaf values: arithmetic on a
    lazy index array changes the values, so only value-preserving casts may
    be unwrapped for the early host-side IndexError."""
    a_np = np.arange(5.0)
    a = da.from_array(a_np, chunks=2)
    i = da.from_array(np.array([10, 11]), chunks=2)
    # raw leaf values (10, 11) are out of bounds for dim 5, but i-10 is fine
    got = np.asarray(a[i - 10].compute())
    np.testing.assert_array_equal(got, a_np[[0, 1]])
    # astype is value-preserving: still raises early for real OOB values
    j = da.from_array(np.array([7], dtype=np.int32), chunks=1)
    with pytest.raises(IndexError):
        a[j.astype(np.int64)].compute()
