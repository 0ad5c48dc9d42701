"""Submodule alias: dask_array_tpu.reductions."""
from dask_array_tpu.ops.reductions import *  # noqa: F401,F403
