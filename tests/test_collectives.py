"""Explicit SPMD collectives over the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from dask_array_tpu.parallel.collectives import (
    alltoall_reshard,
    halo_exchange,
    psum_reduce,
)


@pytest.fixture
def ring8():
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices("cpu")[:8]), ("r",))


def _put(x, mesh, axis):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = [None] * x.ndim
    spec[axis] = "r"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def test_halo_exchange(ring8, rng):
    x = rng.standard_normal((32, 6))
    xs = _put(x, ring8, 0)
    out = np.asarray(halo_exchange(xs, ring8, "r", axis=0, depth=1))
    # global result: 8 shards of 4 rows -> each becomes 6 rows (halo + 4 + halo)
    assert out.shape == (48, 6)
    shards = x.reshape(8, 4, 6)
    for i in range(8):
        got = out[i * 6:(i + 1) * 6]
        left = shards[i - 1][-1:] if i > 0 else np.zeros((1, 6))
        right = shards[i + 1][:1] if i < 7 else np.zeros((1, 6))
        np.testing.assert_allclose(got, np.concatenate([left, shards[i], right]), atol=0)


def test_halo_exchange_periodic(ring8, rng):
    x = rng.standard_normal((16, 3))
    xs = _put(x, ring8, 0)
    out = np.asarray(halo_exchange(xs, ring8, "r", axis=0, depth=1, wrap=True))
    shards = x.reshape(8, 2, 3)
    got0 = out[:4]
    np.testing.assert_allclose(got0, np.concatenate([shards[-1][-1:], shards[0], shards[1][:1]]))


def test_alltoall_reshard(ring8, rng):
    x = rng.standard_normal((16, 24))
    xs = _put(x, ring8, 0)
    out = alltoall_reshard(xs, ring8, "r", from_axis=0, to_axis=1)
    np.testing.assert_allclose(np.asarray(out), x)
    # output really is sharded along axis 1 now
    spec = out.sharding.spec
    assert spec[1] == "r" or (isinstance(spec[1], tuple) and "r" in spec[1]), spec


def test_psum_reduce(ring8, rng):
    x = rng.standard_normal((24, 5))
    xs = _put(x, ring8, 0)
    out = np.asarray(psum_reduce(xs, ring8, "r", axis=0))
    np.testing.assert_allclose(out, x.sum(axis=0), rtol=1e-12)
