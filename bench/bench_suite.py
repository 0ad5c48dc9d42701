"""End-to-end timings of the five BASELINE.md workloads.

Decision record (v5e-1, axon tunnel, 2026-08-16): first-run numbers include
compile; steady-state excludes the host fetch RTT (~24 ms tunnel latency).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def timed(label, build, iters=3):
    import dask_array_tpu as da

    t0 = time.perf_counter()
    out = build()
    t_build = time.perf_counter() - t0

    arrs = out if isinstance(out, tuple) else (out,)
    t0 = time.perf_counter()
    opts = [a.optimize() for a in arrs]
    t_opt = time.perf_counter() - t0

    t0 = time.perf_counter()
    devs = [a.compute_device() for a in arrs]
    _ = [np.asarray(d.ravel()[0]) for d in devs]
    t_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        devs = [a.compute_device() for a in arrs]
    _ = [np.asarray(d.ravel()[0]) for d in devs]
    t_steady = (time.perf_counter() - t0) / iters

    print(
        f"{label:24s} build {t_build * 1e3:8.2f} ms | optimize {t_opt * 1e3:8.2f} ms | "
        f"first(run+compile) {t_first:7.2f} s | steady {t_steady * 1e3:9.2f} ms"
    )


def main():
    from dask_array_tpu.models import pipelines as P

    timed("readme_slice_pushdown", lambda: P.readme_example())
    timed("reduction_tree_10k", lambda: P.reduction_tree())
    timed("blocked_matmul_8192", lambda: P.blocked_matmul())
    timed("stencil2d_4096", lambda: P.stencil2d())
    timed("tsqr_svd_1e6x128", lambda: P.tall_skinny_svd(), iters=1)


if __name__ == "__main__":
    main()
