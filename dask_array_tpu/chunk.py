"""Public alias for the per-block kernels (parity: dask_array.chunk)."""

from dask_array_tpu._chunk import *  # noqa: F401,F403
from dask_array_tpu._chunk import (  # noqa: F401
    argtopk,
    astype,
    coarsen,
    concat,
    flatten,
    getitem,
    keepdims_wrapper,
    topk,
    trim,
    view,
)
