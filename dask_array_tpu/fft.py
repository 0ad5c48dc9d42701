"""Submodule alias: dask_array_tpu.fft (parity with dask_array.fft)."""
from dask_array_tpu.ops.fft import *  # noqa: F401,F403
from dask_array_tpu.ops.fft import fft_wrap  # noqa: F401
