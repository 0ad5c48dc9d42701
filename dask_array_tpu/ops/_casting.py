"""dtype casting as an elementwise expression."""

from __future__ import annotations

import numpy as np

from dask_array_tpu._blockwise import Elemwise


def _astype(x, dtype=None):
    return x.astype(dtype)


def astype_expr(expr, dtype):
    dtype = np.dtype(dtype)
    if expr.dtype == dtype:
        return expr
    return Elemwise(_astype, (("dtype", dtype.str),), expr)
