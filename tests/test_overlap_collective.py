"""map_overlap as an explicit minimal halo-exchange collective.

Roadmap item: the per-block halo pipeline is correct under GSPMD but a
depth-1 stencil over 8 shards compiles to HUNDREDS of small
collective-permutes.  With ``tpu.overlap-method="shard"`` the whole stencil
runs as one shard_map with exactly one lo/hi ring exchange per sharded halo
axis — proven here by HLO inspection (the discipline of
``test_rechunk_collective.py``).  Parity target: the reference's overlap
ghost-cell layer (``/root/reference/dask_array/_overlap.py:70,1041``)
collapsed to the SPMD ring exchange of SURVEY §2.6.
"""

import re

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu import config
from dask_array_tpu._diagnostics import compiled_hlo
from dask_array_tpu.ops._overlap import ShardStencil
from dask_array_tpu.parallel import use_mesh


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.fixture
def ring8():
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices("cpu")[:8])
    return Mesh(devs, ("r",))


def _mean3(b):
    import jax.numpy as jnp

    # 3-point moving mean along axis 0: genuinely READS the halo rows
    return (jnp.roll(b, 1, axis=0) + b + jnp.roll(b, -1, axis=0)) / 3.0


def _double(b):
    return b * 2


@pytest.mark.parametrize("boundary", ["reflect", "nearest", "periodic", 0.0])
def test_shard_stencil_value_parity(rng, ring8, boundary):
    data = rng.standard_normal((64, 16))
    x = da.from_array(data, chunks=(8, 16))
    expected = np.asarray(
        da.map_overlap(_mean3, x, depth={0: 1}, boundary=boundary).compute()
    )
    with config.set({"tpu.overlap-method": "shard"}):
        shard = da.map_overlap(_mean3, x, depth={0: 1}, boundary=boundary)
        assert isinstance(shard.expr, ShardStencil)
        with use_mesh(ring8):
            got = np.asarray(shard.compute())
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_shard_stencil_minimal_ring_schedule(rng, ring8):
    """THE claim: one lo + one hi ppermute, no all-to-all / all-gather."""
    x = da.from_array(rng.standard_normal((64, 16)), chunks=(8, 16))
    with config.set({"tpu.overlap-method": "shard"}):
        shard = da.map_overlap(_mean3, x, depth={0: 1}, boundary="reflect")
        with use_mesh(ring8):
            hlo = compiled_hlo(shard, mesh=ring8)
    assert len(re.findall("collective-permute", hlo)) == 2
    assert "all-to-all" not in hlo
    assert "all-gather" not in hlo


def test_auto_path_emits_many_permutes(rng, ring8):
    """The contrast that justifies the mode: per-block halos under GSPMD
    compile to far more collectives than the explicit ring."""
    x = da.from_array(rng.standard_normal((64, 16)), chunks=(8, 16))
    auto = da.map_overlap(_mean3, x, depth={0: 1}, boundary="reflect")
    with use_mesh(ring8):
        hlo = compiled_hlo(auto, mesh=ring8)
    assert len(re.findall("collective-permute", hlo)) > 2


def test_shard_stencil_2d_depth(rng, ring8):
    # depth on a sharded axis AND an unsharded axis (realized locally)
    import jax.numpy as jnp

    def blur(b):
        return (
            jnp.roll(b, 1, 0) + jnp.roll(b, -1, 0) + jnp.roll(b, 1, 1) + jnp.roll(b, -1, 1) + b
        ) / 5.0

    data = rng.standard_normal((64, 32))
    x = da.from_array(data, chunks=(8, 32))
    expected = np.asarray(
        da.map_overlap(blur, x, depth={0: 1, 1: 1}, boundary="reflect").compute()
    )
    with config.set({"tpu.overlap-method": "shard"}):
        shard = da.map_overlap(blur, x, depth={0: 1, 1: 1}, boundary="reflect")
        assert isinstance(shard.expr, ShardStencil)
        with use_mesh(ring8):
            got = np.asarray(shard.compute())
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_shard_stencil_no_mesh_fallback(rng):
    # without a mesh the node computes globally (pad -> func -> trim)
    data = rng.standard_normal((40, 8))
    x = da.from_array(data, chunks=(5, 8))
    expected = np.asarray(
        da.map_overlap(_mean3, x, depth={0: 1}, boundary="nearest").compute()
    )
    with config.set({"tpu.overlap-method": "shard"}):
        got = np.asarray(
            da.map_overlap(_mean3, x, depth={0: 1}, boundary="nearest").compute()
        )
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_shard_stencil_deep_halo_falls_back_global(rng, ring8):
    # halo deeper than one shard (64/8 = 8 rows < depth 10): the ring would
    # need multi-hop; the node must decline to shard and still be correct
    data = rng.standard_normal((64, 8))
    x = da.from_array(data, chunks=(16, 8))
    expected = np.asarray(
        da.map_overlap(_double, x, depth={0: 10}, boundary="reflect").compute()
    )
    with config.set({"tpu.overlap-method": "shard"}):
        shard = da.map_overlap(_double, x, depth={0: 10}, boundary="reflect")
        with use_mesh(ring8):
            got = np.asarray(shard.compute())
    np.testing.assert_allclose(got, expected)


@pytest.mark.parametrize(
    "kwargs",
    [
        {"boundary": "none"},  # edge halos shrink: inherently per-block
        {"boundary": "reflect", "trim": False},
        {"boundary": "reflect", "chunks": (8, 16)},
    ],
)
def test_ineligible_cases_stay_on_block_pipeline(rng, kwargs):
    x = da.from_array(rng.standard_normal((64, 16)), chunks=(8, 16))
    with config.set({"tpu.overlap-method": "shard"}):
        out = da.map_overlap(_double, x, depth={0: 1}, **kwargs)
    assert not isinstance(out.expr, ShardStencil)


def test_multi_array_stays_on_block_pipeline(rng):
    x = da.from_array(rng.standard_normal((32, 8)), chunks=(8, 8))
    y = da.from_array(rng.standard_normal((32, 8)), chunks=(8, 8))
    with config.set({"tpu.overlap-method": "shard"}):
        out = da.map_overlap(lambda a, b: a + b, x, y, depth={0: 1}, boundary="reflect")
    assert not isinstance(out.expr, ShardStencil)
    expected = np.asarray(
        da.map_overlap(lambda a, b: a + b, x, y, depth={0: 1}, boundary="reflect").compute()
    )
    np.testing.assert_allclose(np.asarray(out.compute()), expected)


def test_shard_stencil_dtype_kwarg(rng, ring8):
    x = da.from_array(rng.standard_normal((64, 8)), chunks=(8, 8))
    with config.set({"tpu.overlap-method": "shard"}):
        out = da.map_overlap(
            _double, x, depth={0: 1}, boundary="reflect", dtype=np.float32
        )
        assert out.dtype == np.float32
        with use_mesh(ring8):
            got = np.asarray(out.compute())
    assert got.dtype == np.float32
