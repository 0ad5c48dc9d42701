"""Submodule alias: dask_array_tpu.routines."""
from dask_array_tpu.ops.routines import *  # noqa: F401,F403
