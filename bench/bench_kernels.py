"""Pallas kernel vs XLA benchmarks (real chip).

Decision record (v5e-1, axon tunnel, 2026-08-16):
  histogram 64M f32 / 256 bins : XLA (jnp.histogram, scatter) 6220 ms
                                 Pallas compare-accumulate     110.5 ms (56.3x, exact)
  bincount 64M i32 / 256 bins  : XLA (jnp.bincount)            5260 ms
                                 Pallas (f32 edges path)       114.4 ms (46.0x, exact)
  tile sweep (SUB, ROWS) in {8..64} x {512..2048}: flat at ~110 ms —
  compute-bound on the N x nbins compare sweep, as designed.
The Pallas matmul kernel from round 1 was DELETED: XLA's GEMM reaches
94-97 % of MXU peak at the BASELINE shapes and the kernel lost (127 vs
151+ TFLOP/s) — "win or delete" resolved as delete + pick a fight XLA
actually loses (the scatter-serialized histogram family).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax.numpy as jnp

    return np.asarray(jnp.ravel(x)[0])


def timeit(f, *a, n=10):
    r = f(*a)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    _sync(r)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from dask_array_tpu.kernels.histogram import histogram as khist

    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    n = 64_000_000
    x = jax.random.normal(key, (n,), dtype=jnp.float32)
    edges = jnp.linspace(-4, 4, 257, dtype=jnp.float32)

    xla = jax.jit(lambda d: jnp.histogram(d, bins=edges)[0])
    t_xla = timeit(xla, x, n=3)
    pallas = jax.jit(lambda d: khist(d, edges))
    t_pal = timeit(pallas, x)
    # parity check
    a = np.asarray(xla(x))
    b = np.asarray(pallas(x))
    ok = np.array_equal(a, b)
    gbps = x.nbytes / t_pal / 1e9
    print(
        f"histogram 64M f32/256 bins: XLA {t_xla*1e3:9.1f} ms | "
        f"Pallas {t_pal*1e3:7.2f} ms ({gbps:6.1f} GB/s, {t_xla/t_pal:6.1f}x) "
        f"| match={ok}"
    )

    ints = jax.random.randint(key, (n,), 0, 256)
    xlab = jax.jit(lambda i: jnp.bincount(i, length=256))
    t_xb = timeit(xlab, ints, n=3)
    pb = jax.jit(lambda i: khist(i.astype(jnp.float32), jnp.arange(257, dtype=jnp.float32)))
    t_pb = timeit(pb, ints)
    okb = np.array_equal(np.asarray(xlab(ints)), np.asarray(pb(ints)))
    print(
        f"bincount  64M i32/256 bins: XLA {t_xb*1e3:9.1f} ms | "
        f"Pallas {t_pb*1e3:7.2f} ms ({ints.nbytes/t_pb/1e9:6.1f} GB/s, {t_xb/t_pb:6.1f}x) "
        f"| match={okb}"
    )


if __name__ == "__main__":
    main()
