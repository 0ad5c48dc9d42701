"""dtype casting as an elementwise expression."""

from __future__ import annotations

import numpy as np

from dask_array_tpu._blockwise import Elemwise


def _astype(x, dtype=None):
    dt = np.dtype(dtype)
    if dt.kind == "u" and np.issubdtype(np.dtype(x.dtype), np.floating):
        # numpy float->unsigned casts truncate toward zero then wrap
        # modularly; XLA's convert clamps negatives to 0 — route through
        # int64 (truncates) then to unsigned (bit-truncation wraps)
        return x.astype(np.int64).astype(dt)
    return x.astype(dtype)


def astype_expr(expr, dtype):
    dtype = np.dtype(dtype)
    if expr.dtype == dtype:
        return expr
    return Elemwise(_astype, (("dtype", dtype.str),), expr)
