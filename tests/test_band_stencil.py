"""Pallas band-stencil kernel (kernels/stencil.py), interpret-mode lane.

The kernel runs the map_overlap user function on VMEM-resident padded
bands.  These tests drive it through the public ``map_overlap`` with
``tpu.stencil-kernel="interpret"`` (the CPU-validation mode) and compare
against the default XLA path.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu import config
from dask_array_tpu.ops._overlap import BandStencil


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _laplace(b):
    import jax.numpy as jnp

    return (
        jnp.roll(b, 1, 0) + jnp.roll(b, -1, 0) + jnp.roll(b, 1, 1) + jnp.roll(b, -1, 1)
        - 4 * b
    )


def _both(rng, boundary, depth, shape=(64, 96), chunks=(16, 48)):
    x = rng.standard_normal(shape).astype(np.float32)
    d = da.from_array(x, chunks=chunks)
    ref = da.map_overlap(_laplace, d, depth=depth, boundary=boundary, dtype="float32")
    with config.set({"tpu.stencil-kernel": "interpret"}):
        fast = da.map_overlap(_laplace, d, depth=depth, boundary=boundary, dtype="float32")
        assert isinstance(fast.expr, BandStencil)
        got = fast.compute()
    return got, ref.compute()


@pytest.mark.parametrize("boundary", ["reflect", "nearest", "periodic", 0.0])
def test_band_stencil_boundaries(rng, boundary):
    got, want = _both(rng, boundary, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_band_stencil_mixed_depth(rng):
    got, want = _both(rng, "reflect", {0: 2, 1: 1})
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_band_stencil_depth_zero_axis(rng):
    # depth-0 axis: the function must be LOCAL along it (the map_overlap
    # contract), so use a vertical-only stencil
    def vert(b):
        import jax.numpy as jnp

        return jnp.roll(b, 1, 0) + jnp.roll(b, -1, 0) - 2 * b

    x = rng.standard_normal((64, 96)).astype(np.float32)
    d = da.from_array(x, chunks=(16, 48))
    ref = da.map_overlap(vert, d, depth={0: 1, 1: 0}, boundary="reflect", dtype="float32").compute()
    with config.set({"tpu.stencil-kernel": "interpret"}):
        fast = da.map_overlap(vert, d, depth={0: 1, 1: 0}, boundary="reflect", dtype="float32")
        assert isinstance(fast.expr, BandStencil)
        got = fast.compute()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_band_stencil_ineligible_falls_back(rng):
    with config.set({"tpu.stencil-kernel": "interpret"}):
        # 3-D: not eligible
        o3 = da.map_overlap(lambda b: b * 1.0, da.ones((8, 8, 8), chunks=4), depth=1, boundary="reflect", dtype="float64")
        assert not isinstance(o3.expr, BandStencil)
        np.testing.assert_allclose(o3.compute(), 1.0)
        # asymmetric depth: not eligible
        x = da.from_array(rng.standard_normal((64, 64)).astype("f4"), chunks=16)
        oa = da.map_overlap(lambda b: b, x, depth={0: (1, 0), 1: 0}, boundary="none", dtype="float32")
        assert not isinstance(oa.expr, BandStencil)


def test_band_stencil_off_by_default(rng):
    x = da.from_array(rng.standard_normal((64, 64)).astype("f4"), chunks=16)
    o = da.map_overlap(_laplace, x, depth=1, boundary="reflect", dtype="float32")
    assert not isinstance(o.expr, BandStencil)


def test_band_stencil_eager_mode_falls_back(rng):
    # the eager lane uses the whole-array pad->func->trim form
    x = rng.standard_normal((64, 64)).astype(np.float32)
    d = da.from_array(x, chunks=16)
    ref = da.map_overlap(_laplace, d, depth=1, boundary="reflect", dtype="float32").compute()
    with config.set({"tpu.stencil-kernel": "interpret", "tpu.jit": False}):
        got = da.map_overlap(_laplace, d, depth=1, boundary="reflect", dtype="float32").compute()
    np.testing.assert_allclose(got, ref, atol=1e-5)
