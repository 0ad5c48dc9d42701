"""Submodule alias: dask_array_tpu.linalg (parity with dask_array.linalg)."""
from dask_array_tpu.ops.linalg import *  # noqa: F401,F403
from dask_array_tpu.ops.linalg import dot, matmul, outer, tensordot, vdot  # noqa: F401
from dask_array_tpu.ops.linalg_decomp import *  # noqa: F401,F403
