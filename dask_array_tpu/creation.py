"""Submodule alias: dask_array_tpu.creation."""
from dask_array_tpu.ops.creation import *  # noqa: F401,F403
