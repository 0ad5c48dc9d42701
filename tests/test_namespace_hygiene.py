"""Namespace hygiene + lazy-metadata meta-tests.

Ports the reference's ``tests/test_public_namespace.py`` guards (star-import
binds no submodules, __all__ resolves, version exposed, repr error
transparency) and the remaining ``tests/test_lazy_metadata.py`` cases
(metadata access must not force chunk computation; explicit dtype changes
identity).
"""

import types

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


def test_package_version_is_exposed():
    assert isinstance(da.__version__, str)
    assert da.__version__


def test_import_star_helpers_do_not_leak_into_package_namespace():
    for name in ["partial", "functools", "np", "re", "merge", "concat", "jax", "jnp"]:
        assert name not in da.__all__, name
    assert hasattr(da, "add")
    assert hasattr(da, "apply_gufunc")
    assert hasattr(da, "unique")


def test_star_import_binds_no_submodules():
    # `from dask_array_tpu import *` must not bind submodule names: `io`
    # would shadow the stdlib and `xarray` the real package.
    namespace = {}
    exec("from dask_array_tpu import *", namespace)
    modules = [
        name
        for name, value in namespace.items()
        if isinstance(value, types.ModuleType) and not name.startswith("__")
    ]
    assert modules == [], modules
    assert "annotations" not in namespace
    assert callable(namespace["from_array"])
    assert callable(namespace["push"])
    assert callable(namespace["where"])


def test_all_names_resolve():
    missing = [name for name in da.__all__ if not hasattr(da, name)]
    assert missing == [], missing


def test_submodules_stay_reachable_as_attributes():
    # excluded from star-import, but present for qualified access
    assert hasattr(da.fft, "fftfreq")
    assert hasattr(da.linalg, "qr")
    assert hasattr(da.random, "default_rng")
    assert callable(da.chunk.coarsen)
    assert callable(da.chunk.getitem)


def test_expr_repr_does_not_swallow_unexpected_errors(monkeypatch):
    expr = da.ones((2,), chunks=1).expr

    cls = type(expr)
    target = None
    for attr in ("_table", "tree_repr", "__repr__"):
        if attr in vars(cls) or any(attr in vars(b) for b in cls.__mro__[1:-1]):
            target = attr
            break
    assert target is not None

    def broken(self, *a, **k):
        raise RuntimeError("boom")

    monkeypatch.setattr(cls, "__repr__", broken)
    with pytest.raises(RuntimeError, match="boom"):
        repr(expr)


# -- lazy metadata: access must not force chunks --------------------------------


def test_map_blocks_dtype_does_not_compute_chunks():
    x = da.ones((512, 512), chunks=(64, 64))
    expr = x.map_blocks(lambda b: b + 1, dtype=x.dtype).expr
    assert expr.dtype == np.float64
    assert "chunks" not in vars(expr)


def test_ndim_does_not_compute_chunks():
    x = da.ones((512, 512), chunks=(64, 64))
    expr = x.map_blocks(lambda b: b + 1, dtype=x.dtype).expr
    assert expr.ndim == 2
    assert "chunks" not in vars(expr)


def test_decoupling_preserves_results_and_metadata():
    x = da.ones((10, 8), chunks=(5, 4))
    y = da.ones((10, 8), chunks=(5, 4))
    z = (x + y * 2).map_blocks(lambda b: b + 1, dtype="float64")[2:9, 1:7]
    assert z.dtype == np.float64
    assert z.shape == (7, 6)
    assert z.ndim == 2
    assert_eq(z, (np.ones((10, 8)) * 3 + 1)[2:9, 1:7])


def test_explicit_dtype_changes_identity():
    x = da.ones((10, 8), chunks=(5, 4))
    y = da.ones((10, 8), chunks=(5, 4))
    default = da.add(x, y)
    cast = da.add(x, y, dtype="float32")
    assert default.expr._name != cast.expr._name
    assert cast.dtype == np.float32
    assert_eq(cast, np.full((10, 8), 2.0, dtype="float32"))
