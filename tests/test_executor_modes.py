"""Eager-mode execution (tpu.jit off) and elemwise where=/out= semantics."""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu import config
from dask_array_tpu._test_utils import assert_eq


def test_eager_mode_matches_jit(rng):
    x = rng.standard_normal((12, 12))
    d = da.from_array(x, chunks=4)
    pipeline = ((d + 1) @ d.T).sum(axis=0)[3:9]
    with config.set({"tpu.jit": False}):
        eager = pipeline.compute()
    jitted = pipeline.compute()
    np.testing.assert_allclose(eager, jitted, rtol=1e-12)
    np.testing.assert_allclose(eager, ((x + 1) @ x.T).sum(axis=0)[3:9], rtol=1e-10)


def test_eager_mode_per_block_ops(rng):
    x = rng.standard_normal((8, 8))
    d = da.from_array(x, chunks=4)
    with config.set({"tpu.jit": False}):
        out = d.map_blocks(lambda b: b * 2, dtype=x.dtype).compute()
        ov = da.map_overlap(lambda b: b * 1.0, d, depth=1, boundary="reflect", dtype=x.dtype).compute()
    np.testing.assert_allclose(out, x * 2)
    np.testing.assert_allclose(ov, x)


def test_elemwise_out(rng):
    import jax.numpy as jnp

    x = rng.standard_normal((6, 6))
    d = da.from_array(x.copy(), chunks=3)
    out = da.ones((6, 6), chunks=3)
    res = da.add(d, 5, out=out)
    assert res is out
    assert_eq(out, x + 5)


def test_elemwise_where_out(rng):
    x = rng.standard_normal((6, 6))
    d = da.from_array(x, chunks=3)
    base = da.zeros((6, 6), chunks=3)
    cond = d > 0
    res = da.multiply(d, 2, where=cond, out=base)
    expected = np.where(x > 0, x * 2, 0.0)
    assert_eq(res, expected)


def test_from_device_array(rng):
    import jax.numpy as jnp

    x = jnp.asarray(rng.standard_normal((8, 8)))
    d = da.from_array(x, chunks=4)
    assert d.chunks == ((4, 4), (4, 4))
    out = (d * 2).compute()
    np.testing.assert_allclose(out, np.asarray(x) * 2)


def test_scalar_and_zero_d():
    s = da.from_array(np.float64(3.0))
    assert s.shape == ()
    assert float((s + 1).compute()) == 4.0
    z = da.ones((), chunks=())
    assert z.compute() == 1.0


def test_untraceable_host_function_falls_back(rng):
    import scipy.ndimage

    from dask_array_tpu import config

    if not config.get("tpu.jit", True):
        pytest.skip("eager lane never attempts a trace, so no fallback warning")

    x = rng.standard_normal((8, 8))
    d = da.from_array(x, chunks=4)

    def host_fn(b):
        # pure-numpy/scipy host code: not jax-traceable
        return scipy.ndimage.gaussian_filter(np.asarray(b), sigma=0.0)

    out = d.map_blocks(host_fn, dtype=x.dtype)
    with pytest.warns(RuntimeWarning, match="not jax-traceable"):
        got = out.compute()
    np.testing.assert_allclose(got, x)


def test_to_delayed_blocks(rng):
    x = rng.standard_normal((8, 6))
    d = da.from_array(x, chunks=(4, 3))
    blocks = d.to_delayed()
    assert blocks.shape == (2, 2)
    np.testing.assert_allclose(blocks[0, 1].compute(), x[:4, 3:])
