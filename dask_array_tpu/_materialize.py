"""The optimize -> execute choke point.

Parity: ``/root/reference/dask_array/_materialize.py`` — but where the
reference materializes a task graph, we optimize the expression tree
(simplify -> lower -> fuse) and hand it to the trace-to-XLA executor.
"""

from __future__ import annotations

import numpy as np

from dask_array_tpu import config
from dask_array_tpu._executor import execute
from dask_array_tpu._expr import ArrayExpr


def optimize_expr(expr: ArrayExpr, fuse: bool = True) -> ArrayExpr:
    if not config.get("array.optimize-graph", True):
        return expr.lower_completely()
    return expr.optimize(fuse=fuse)


def compute_expr(expr: ArrayExpr, optimize: bool = True):
    """Optimize + execute; returns the dense on-device jax.Array."""
    lowered = optimize_expr(expr) if optimize else expr
    return execute(lowered)


def compute_to_numpy(expr: ArrayExpr):
    out = compute_expr(expr)
    arr = np.asarray(out)
    return arr
