"""Optimizer wall-time on large synthetic expression DAGs.

The analog of the reference's unify/rechunk-insertion wall benchmarks
(bench_unify_policy.py "macro quantity DAG": 20.2 s / 75k tasks for the
auto policy).  This framework's plan is O(expression nodes), not O(task
blocks), so the same logical pipelines optimize in milliseconds — record
the numbers here as the decision record.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def deep_elemwise_chain(depth=200):
    import dask_array_tpu as da

    x = da.ones((1000, 1000), chunks=100)
    for i in range(depth):
        x = x + i
    return x


def wide_sum_tree(width=128):
    import dask_array_tpu as da

    leaves = [da.ones((500, 500), chunks=100) * i for i in range(width)]
    out = leaves[0]
    for leaf in leaves[1:]:
        out = out + leaf
    return out


def wide_loader_stack(width=500):
    """The read-many-files pattern: stack of from_delayed loader leaves.

    The grouped FromMap collapse turns width expression nodes into ONE plan
    node (the reference needs its Rust grouped layer for the same shape)."""
    import dask_array_tpu as da
    from dask_array_tpu.io._from_map import delayed, from_delayed

    def load(i):
        return np.full((16, 16), i, dtype=np.float64)

    parts = [from_delayed(delayed(load)(i), shape=(16, 16), dtype="f8") for i in range(width)]
    return da.stack(parts, axis=0).sum(axis=(1, 2))


def mixed_macro_dag():
    """Mixed pipeline: misaligned elemwise + rechunks + slices + reductions."""
    import dask_array_tpu as da

    a = da.ones((4000, 4000), chunks=250)
    b = da.ones((4000, 4000), chunks=400)
    c = (a + b).rechunk(500)
    d = (c.T * 2)[:2000, :2000]
    return (d - d.mean(axis=0)).sum(axis=1)


def run(label, build):
    t0 = time.perf_counter()
    x = build()
    t_build = time.perf_counter() - t0
    n_raw = sum(1 for _ in x.expr.walk())
    t0 = time.perf_counter()
    opt = x.expr.optimize()
    t_opt = time.perf_counter() - t0
    n_opt = sum(1 for _ in opt.walk())
    blocks = opt.npartitions
    print(
        f"{label:22s} build {t_build * 1e3:8.1f} ms | optimize {t_opt * 1e3:8.1f} ms | "
        f"nodes {n_raw:5d} -> {n_opt:4d} | output blocks {blocks}"
    )


if __name__ == "__main__":
    # warm the import-time machinery (jnp ufunc dispatch, meta inference)
    # once so the rows measure the optimizer, not the first jax import
    # (~1.7 s one-time, measured)
    deep_elemwise_chain(2).expr.optimize()
    run("deep_chain_200", deep_elemwise_chain)
    run("wide_tree_128", wide_sum_tree)
    run("wide_loader_stack_500", wide_loader_stack)
    run("mixed_macro_dag", mixed_macro_dag)
