"""Pallas MXU matmul kernel.

The role of the reference's native (Rust) fast path for contraction-heavy
plans (SURVEY.md §2.5 "TPU mapping note"): a hand-tiled MXU kernel used by
the executor for large block contractions when it beats plain XLA dot
(toggle: config ``tpu.pallas-matmul``).  f32 accumulation in VMEM scratch,
K-innermost grid for accumulator reuse.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _build_matmul(m, k, n, bm, bk, bn, in_dtype_str, out_dtype_str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    in_dtype = jnp.dtype(in_dtype_str)
    out_dtype = jnp.dtype(out_dtype_str)
    n_k = k // bk

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(
            a_ref[:], b_ref[:], preferred_element_type=jnp.float32
        )

        @pl.when(ki == n_k - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(out_dtype)

    grid = (m // bm, n // bn, n_k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, ki: (i, ki)),
            pl.BlockSpec((bk, bn), lambda i, j, ki: (ki, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * k + k * n) * in_dtype.itemsize + m * n * out_dtype.itemsize,
            transcendentals=0,
        ),
    )


def pallas_matmul(a, b, out_dtype=None, bm=512, bk=1024, bn=1024):
    """a @ b through the Pallas kernel; falls back to jnp.dot on shape
    misalignment."""
    import jax.numpy as jnp

    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    if out_dtype is None:
        out_dtype = a.dtype
    if m % bm or k % bk or n % bn:
        return jnp.dot(a, b, preferred_element_type=out_dtype).astype(out_dtype)
    fn = _build_matmul(m, k, n, bm, bk, bn, str(a.dtype), str(jnp.dtype(out_dtype)))
    return fn(a, b)
