"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The driver benches on real TPU hardware; tests validate semantics and
multi-chip sharding on CPU (jax devices are faked via XLA_FLAGS, as the
reference validates its distributed path with an in-process LocalCluster —
/root/reference/dask_array/tests/conftest.py:42-63).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon site hook forces jax_platforms back to "axon,cpu"; tests must run
# on the virtual CPU mesh (the driver benches on the real chip separately)
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# second-execution-backend lane (the reference's --scheduler=dask/frisky/both
# discipline, conftest.py:42-63): DA_TPU_MODE=eager re-runs the whole suite
# through the eager per-value executor instead of the compiled trace
if os.environ.get("DA_TPU_MODE") == "eager":
    from dask_array_tpu import config as _config

    _config.set_global({"tpu.jit": False})


def pytest_collection_modifyitems(config, items):
    if os.environ.get("DA_TPU_MODE") != "eager":
        return
    import pytest as _pytest

    skip = _pytest.mark.skip(
        reason="optimizer-structure test: identical in the eager lane "
        "(and hypothesis x eager per-value execution is minutes per case)"
    )
    for item in items:
        if "test_fuzz_optimize" in item.nodeid:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def mesh8():
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices("cpu")[:8]).reshape(2, 4)
    return Mesh(devs, ("x", "y"))
