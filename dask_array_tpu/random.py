"""Submodule alias: dask_array_tpu.random (parity with dask_array.random)."""
from dask_array_tpu.ops.random import *  # noqa: F401,F403
from dask_array_tpu.ops.random import (  # noqa: F401
    Generator, RandomState, choice, default_rng,
)
