"""Reductions/linalg/creation parity, fifth batch — the remaining reference
test names with no same-name analog (/root/reference/dask_array/tests/
test_reductions.py, test_linalg.py, test_creation.py).

Adapted-to-this-design scenarios (noted inline):
  * arg reductions over unknown chunks COMPUTE here (unknown chunk sizes
    resolve at materialization) where the reference raises ValueError
  * the two package-layering tests pin THIS package's layering invariants
    (shim modules are leaf-only; construction never lowers reductions)
  * ``repeat`` supports axis=None and array repeats (reference raises
    NotImplementedError for both); invalid-length array repeats raise
    numpy's ValueError
"""

import ast
import pathlib
import warnings

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dtype", ["f4", "c8"])
@pytest.mark.parametrize(
    "vals",
    [[np.inf, np.nan, -np.inf, 2], [np.nan, np.nan, 3, 2]],
    ids=["inf-nan", "nan-nan"],
)
def test_reductions_1D_nans(vals, dtype):
    x = np.array(vals).astype(dtype)
    a = da.from_array(x, chunks=(1,))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        for f, nf in [
            (da.nansum, np.nansum),
            (da.nanprod, np.nanprod),
            (da.nanmean, np.nanmean),
            (da.nanvar, np.nanvar),
            (da.nanstd, np.nanstd),
        ]:
            got = f(a).compute()
            expect = nf(x)
            assert np.allclose(got, expect, equal_nan=True), (nf.__name__, got, expect)
        if dtype == "f4":  # min/max of complex values: numpy lexicographic, niche
            for f, nf in [(da.nanmin, np.nanmin), (da.nanmax, np.nanmax)]:
                got = f(a).compute()
                expect = nf(x)
                assert np.allclose(got, expect, equal_nan=True)


@pytest.mark.parametrize("func", ["argmax", "nanargmax"])
def test_arg_reductions_unknown_chunksize_2d(func):
    # reference raises ValueError for axis=0 over unknown multi-chunk dims;
    # here unknown chunk sizes resolve at materialization, so both axes
    # compute — assert values against numpy
    xnp = np.arange(100.0).reshape(10, 10) % 7 + 1
    x = da.from_array(xnp, chunks=(5, 5))
    x = x[x[:, 0] > 0, :]  # unknown chunks in first dimension only
    nfunc = getattr(np, func.replace("nan", "nan") if "nan" in func else func)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        assert np.array_equal(getattr(da, func)(x, axis=0).compute(), nfunc(xnp, axis=0))
        assert np.array_equal(getattr(da, func)(x, axis=1).compute(), nfunc(xnp, axis=1))


@pytest.mark.parametrize("func", ["argmax", "nanargmax"])
def test_arg_reductions_unknown_single_chunksize(func):
    x = da.ones((10, 10), chunks=(10, 10))
    x = x[x[0, :] > 0, :]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        assert np.array_equal(getattr(da, func)(x, axis=0).compute(), np.zeros(10))
        assert np.array_equal(getattr(da, func)(x, axis=1).compute(), np.zeros(10))


def test_nanquantile_one_dim():
    arr = np.random.default_rng(0).standard_normal(10)
    darr = da.from_array(arr, chunks=(2,))
    assert_eq(da.nanquantile(darr, 0.75, axis=-1), np.nanquantile(arr, 0.75, axis=-1))


def test_nanquantile_two_dims():
    arr = np.random.default_rng(1).standard_normal((10, 10))
    darr = da.from_array(arr, chunks=(2, -1))
    assert_eq(da.nanquantile(darr, 0.75, axis=-1), np.nanquantile(arr, 0.75, axis=-1))
    assert_eq(da.nanpercentile(darr, 0.75, axis=-1), np.nanpercentile(arr, 0.75, axis=-1))


def test_deep_reduction_stack_construction_does_not_lower(monkeypatch):
    """Constructing a deep stack of reductions must not lower them.

    The reference pins this against an O(tree^2) construction blowup where
    chunk unification forced full lowering per layer; here construction is
    fully lazy, so the lowering count is flat at zero at every depth.
    """
    from dask_array_tpu.ops.reductions import Reduction

    calls = 0
    orig_lower = Reduction._lower

    def counting_lower(self):
        nonlocal calls
        calls += 1
        return orig_lower(self)

    monkeypatch.setattr(Reduction, "_lower", counting_lower)

    def build(depth):
        x = da.from_array(np.random.rand(2000, 8), chunks=(500, 8))
        y = da.from_array(np.random.rand(2000, 8), chunks=(700, 8))  # mismatched boundaries
        deep = x
        for _ in range(depth):
            deep = (deep + y) * deep.mean(axis=1, keepdims=True) + deep * 0.001
        return deep

    calls = 0
    build(5)
    shallow = calls
    calls = 0
    build(20)
    deep = calls
    assert shallow == 0
    assert deep == 0


def test_common_reductions_import_after_reductions_package_initialized():
    # reference pins its reductions-package import DAG; this package's
    # analog: the top-level `dask_array_tpu.reductions` shim is importable
    # as the very first touch of the package in a fresh process
    import subprocess
    import sys

    script = (
        "import dask_array_tpu.reductions as r; "
        "assert callable(r.reduction); assert callable(r.nanvar)"
    )
    proc = subprocess.run([sys.executable, "-c", script], capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_implementation_modules_import_reduction_definitions_directly():
    # layering invariant: implementation modules never import through the
    # top-level re-export shims (reductions/routines/creation/linalg/fft/
    # random/chunk/xarray) — only through their real homes under ops/
    root = pathlib.Path(da.__file__).resolve().parent
    shims = {"reductions", "routines", "creation", "linalg", "fft", "random", "chunk", "xarray"}
    offenders = []
    for path in root.rglob("*.py"):
        rel = path.relative_to(root)
        if path.name == "__init__.py" or (len(rel.parts) == 1 and rel.stem in shims):
            continue
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in ast.walk(tree):
            mods = []
            if isinstance(node, ast.ImportFrom) and node.module:
                mods = [node.module]
            elif isinstance(node, ast.Import):
                mods = [a.name for a in node.names]
            for mod in mods:
                parts = mod.split(".")
                if parts[0] == "dask_array_tpu" and len(parts) == 2 and parts[1] in shims:
                    offenders.append(f"{rel}:{node.lineno} {mod}")
    assert offenders == []


# ---------------------------------------------------------------------------
# linalg
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(("shape", "chunk"), [(20, 10), (50, 10)])
def test_inv(shape, chunk):
    rng = np.random.default_rng(1)
    A = rng.integers(1, 10, (shape, shape))
    dA = da.from_array(A, (chunk, chunk))
    res = da.linalg.inv(dA)
    assert np.allclose(res.compute(), np.linalg.inv(A), atol=1e-6)
    assert np.allclose(dA.dot(res).compute(), np.eye(shape), atol=1e-6)


@pytest.mark.parametrize("norm", [None, 1, -1, np.inf, -np.inf])
@pytest.mark.parametrize("keepdims", [False, True])
def test_norm_any_slice(norm, keepdims):
    shape, chunks = (5, 6), (2, 3)
    a = np.random.default_rng(2).random(shape)
    d = da.from_array(a, chunks=chunks)
    for firstaxis in range(len(shape)):
        for secondaxis in range(len(shape)):
            if firstaxis != secondaxis:
                axis = (firstaxis, secondaxis)
            else:
                axis = firstaxis
            a_r = np.linalg.norm(a, ord=norm, axis=axis, keepdims=keepdims)
            d_r = da.linalg.norm(d, ord=norm, axis=axis, keepdims=keepdims)
            assert_eq(a_r, d_r)


@pytest.mark.parametrize(
    "shape, chunks, axis", [[(5,), (2,), None], [(5,), (2,), 0], [(5,), (2,), (0,)]]
)
@pytest.mark.parametrize("norm", [0, 2, -2, 0.5])
@pytest.mark.parametrize("keepdims", [False, True])
def test_norm_1dim(shape, chunks, axis, norm, keepdims):
    a = np.random.default_rng(3).random(shape)
    d = da.from_array(a, chunks=chunks)
    a_r = np.linalg.norm(a, ord=norm, axis=axis, keepdims=keepdims)
    d_r = da.linalg.norm(d, ord=norm, axis=axis, keepdims=keepdims)
    assert_eq(a_r, d_r)


@pytest.mark.parametrize(
    "shape, chunks, axis", [[(5, 6), (2, 2), None], [(5, 6), (2, 2), (0, 1)], [(5, 6), (2, 2), (1, 0)]]
)
@pytest.mark.parametrize("norm", ["fro", "nuc", 2, -2])
@pytest.mark.parametrize("keepdims", [False, True])
def test_norm_2dim(shape, chunks, axis, norm, keepdims):
    a = np.random.default_rng(4).random(shape)
    d = da.from_array(a, chunks=chunks)
    # need one chunk on the last dimension for the svd-backed norms
    if norm == "nuc" or norm == 2 or norm == -2:
        d = d.rechunk({-1: -1})
    a_r = np.linalg.norm(a, ord=norm, axis=axis, keepdims=keepdims)
    d_r = da.linalg.norm(d, ord=norm, axis=axis, keepdims=keepdims)
    assert_eq(a_r, d_r)


# ---------------------------------------------------------------------------
# creation
# ---------------------------------------------------------------------------


def test_repeat():
    x = np.random.default_rng(5).random((10, 11, 13))
    d = da.from_array(x, chunks=(4, 5, 3))

    for r in [0, 1, 2, 5]:
        for ax in [-3, -2, -1, 0, 1, 2]:
            assert_eq(x.repeat(r, axis=ax), d.repeat(r, axis=ax))

    assert_eq(d.repeat(2, 0), da.repeat(d, 2, 0))

    # axis=None flattens, like numpy (reference raises NotImplementedError)
    assert_eq(x.repeat(2), d.repeat(2))
    assert_eq(x.repeat(2), da.repeat(d, 2, None))

    # array repeats work along an axis (reference raises); a length-mismatched
    # repeats array raises numpy's ValueError
    reps = np.arange(11)
    assert_eq(x.repeat(reps, axis=1), da.repeat(d, reps, axis=1))
    with pytest.raises(ValueError):
        da.repeat(d, np.arange(10))

    for invalid_axis in [3, -4]:
        with pytest.raises(ValueError):
            da.repeat(d, 2, axis=invalid_axis)

    d1 = da.arange(5, chunks=(2,))
    assert_eq(np.arange(5).repeat(3), d1.repeat(3))
    for r in [1, 2, 3, 4]:
        assert all(sum(d1.repeat(r).chunks, ()))


@pytest.mark.parametrize("shape_chunks", [((50, 4), (10, 2)), ((50,), (10,))])
@pytest.mark.parametrize("dtype", ["u4", np.float32, None, np.int64])
def test_nan_empty_like(shape_chunks, dtype):
    shape, chunks = shape_chunks
    x1 = da.random.standard_normal(size=shape, chunks=chunks)
    y1 = x1[x1 < 0.5]
    x2 = x1.compute()
    y2 = x2[x2 < 0.5]
    a_da = da.empty_like(y1, dtype=dtype).compute()
    a_np = np.empty_like(y2, dtype=dtype)
    assert a_da.shape == a_np.shape
    assert a_da.dtype == a_np.dtype
