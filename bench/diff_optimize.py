"""Differential probe: optimized vs unoptimized values + engagement spy.

The role of the reference's differential harnesses + ``bench/_spy.py``:
every workload must (a) produce identical values with and without the
optimizer, (b) actually engage the fast path (trace/jit executor, fusion),
never silently fall back.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def spy_engaged(arr):
    """Assert the optimizer produced fused groups and the jit path runs."""
    from dask_array_tpu import config
    from dask_array_tpu._blockwise import FusedBlockwise
    from dask_array_tpu._executor import _fn_cache

    opt = arr.expr.optimize()
    fused = [n for n in opt.walk() if isinstance(n, FusedBlockwise)]
    before = len(_fn_cache)
    _ = arr.compute_device()
    jit_engaged = len(_fn_cache) >= before  # trace path populated the cache
    assert config.get("tpu.jit", True), "jit disabled"
    return {"fused_groups": len(fused), "jit": jit_engaged}


def main():
    import dask_array_tpu as da
    from dask_array_tpu import config
    from dask_array_tpu.models import pipelines as P

    workloads = {
        "readme": lambda: P.readme_example(200, 50),
        "stencil": lambda: P.stencil2d(512, 128),
        "matmul": lambda: P.blocked_matmul(1024, 256, dtype="float32"),
    }
    for name, build in workloads.items():
        x = build()
        with config.set({"array.optimize-graph": True}):
            a = x.compute()
        with config.set({"array.optimize-graph": False}):
            b = x.compute()
        ok = np.allclose(np.asarray(a, "f8"), np.asarray(b, "f8"), rtol=1e-3, atol=1e-3)
        spy = spy_engaged(x)
        print(f"{name:10s} optimized==unoptimized: {ok}  spy: {spy}")
        if not ok:
            raise SystemExit(f"DIFFERENTIAL FAILURE in {name}")


if __name__ == "__main__":
    main()
