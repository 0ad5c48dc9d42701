"""Irregular / non-divisible chunk grids on a mesh (VERDICT round-1 item 5).

The chunks-vs-sharding duality (SURVEY.md §7): an irregular grid must NOT
force full replication.  Leaves whose dims don't divide the mesh transfer
replicated, then an uneven sharding constraint (GSPMD pad-to-regular)
scatters them so all compute is sharded; eager mode (unknown chunks) is
mesh-aware through sharded leaf placement.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._diagnostics import compiled_hlo
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.parallel import use_mesh


@pytest.fixture
def rng():
    return np.random.default_rng(23)


@pytest.fixture
def ring8():
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices("cpu")[:8])
    return Mesh(devs, ("r",))


def test_irregular_grid_compute_is_sharded(ring8, rng):
    # 37 x 23: NO axis divides the 8-way mesh; chunks irregular too
    x = rng.standard_normal((37, 23))
    d = da.from_array(x, chunks=((20, 17), (23,)))
    out = (d * 2 + 1).sum(axis=1)
    with use_mesh(ring8):
        hlo = compiled_hlo(out)
        assert_eq(out, (x * 2 + 1).sum(axis=1))
    # partitioned local shape ceil(37/8)=5 proves the compute was sharded
    # (fully-replicated execution would show f64[37,23] everywhere)
    assert "f64[5,23]" in hlo.replace(" ", ""), "irregular grid was not sharded"


def test_irregular_grid_values_match(ring8, rng):
    x = rng.standard_normal((41, 19))
    d = da.from_array(x, chunks=((13, 13, 15), (10, 9)))
    out = np.sin(d) @ np.cos(d).T
    with use_mesh(ring8):
        assert_eq(out, np.sin(x) @ np.cos(x).T, rtol=1e-10)


def test_divisible_axis_still_preferred(ring8, rng):
    # axis 1 divides the mesh: it must win over uneven axis 0
    from dask_array_tpu.parallel.layout import plan_layout

    spec = plan_layout((37, 24), ((20, 17), (24,)), ring8, allow_uneven=True)
    assert spec == (None, "r")


def test_uneven_only_constraint_layout(ring8):
    from dask_array_tpu.parallel.layout import plan_layout, sharding_for

    # constraint targets may shard unevenly ...
    spec = plan_layout((37, 23), None, ring8, allow_uneven=True)
    assert spec == ("r", None)
    # ... device_put targets must not
    sh = sharding_for((37, 23), ring8)
    from jax.sharding import PartitionSpec

    assert sh.spec == PartitionSpec(None, None)


def test_eager_mode_mesh_aware(ring8, rng):
    # unknown-chunk (boolean mask) pipeline: eager execution with sharded
    # leaf placement, correct values
    x = rng.standard_normal((64, 16))
    mask = x[:, 0] > 0
    d = da.from_array(x, chunks=(8, 16))
    dm = da.from_array(mask, chunks=8)
    filtered = d[dm] * 2.0
    with use_mesh(ring8):
        got = np.asarray(filtered.compute())
    np.testing.assert_allclose(got, x[mask] * 2.0)


def test_tiny_leaf_not_broken_by_constraint(ring8, rng):
    # leaves smaller than the mesh (dim < n_devices) stay replicated
    x = rng.standard_normal((3,))
    d = da.from_array(x, chunks=3)
    with use_mesh(ring8):
        assert_eq(d + 1, x + 1)
