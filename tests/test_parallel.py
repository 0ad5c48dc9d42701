"""Multi-device SPMD execution over a virtual 8-device CPU mesh."""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.parallel import use_mesh


def test_mesh_elemwise_matmul(mesh8, rng):
    x = rng.standard_normal((16, 32)).astype("f4")
    y = rng.standard_normal((32, 8)).astype("f4")
    dx = da.from_array(x, chunks=(8, 8))
    dy = da.from_array(y, chunks=(8, 8))
    with use_mesh(mesh8):
        out = ((dx + 1.0) @ dy).sum(axis=1)
        res = out.compute()
    np.testing.assert_allclose(res, ((x + 1.0) @ y).sum(axis=1), rtol=1e-4)


def test_mesh_rechunk_reduction(mesh8, rng):
    x = rng.standard_normal((32, 16)).astype("f4")
    d = da.from_array(x, chunks=(4, 4))
    with use_mesh(mesh8):
        out = d.rechunk((16, 8)).mean(axis=0)
        res = out.compute()
    np.testing.assert_allclose(res, x.mean(axis=0), rtol=1e-4)


def test_mesh_output_sharded(mesh8, rng):
    """The computed device array is actually laid out across the mesh."""
    import jax

    x = rng.standard_normal((16, 16)).astype("f4")
    d = da.from_array(x, chunks=(8, 8))
    with use_mesh(mesh8):
        out = (d * 2).compute_device()
    assert len(out.sharding.device_set) > 1, out.sharding
    np.testing.assert_allclose(np.asarray(out), x * 2, rtol=1e-5)
