"""Probe: does the axon remote Mosaic compiler accept minimal kernels today?

Three tiny kernels, in increasing complexity:
  k_copy    whole-block copy           (known to work round 2)
  k_transp  512x512 tile transpose grid (for the relayout workload)
  k_band    the shipped band-stencil kernel on a small input

Each runs in this one process; any SIGABRT kills the process, so run this
probe standalone.  python bench/probe_pallas_min.py [copy|transp|band|time_transp]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def k_copy():
    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.arange(256 * 256, dtype=jnp.float32).reshape(256, 256)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        grid=(2,),
        in_specs=[pl.BlockSpec((128, 256), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x)
    ok = np.allclose(np.asarray(out), np.asarray(x) * 2.0)
    print("copy", "OK" if ok else "MISMATCH", flush=True)


def _transp_call(x, T=512):
    N = x.shape[0]

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, N), x.dtype),
        grid=(N // T, N // T),
        in_specs=[pl.BlockSpec((T, T), lambda i, j: (j, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, T), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )(x)


def k_transp():
    x = jnp.arange(1024 * 1024, dtype=jnp.float32).reshape(1024, 1024)
    out = _transp_call(x, T=512)
    ok = np.allclose(np.asarray(out), np.asarray(x).T)
    print("transp", "OK" if ok else "MISMATCH", flush=True)


def time_transp():
    N = 8192
    x = jnp.array(np.random.default_rng(0).standard_normal((N, N), np.float32))
    _ = np.asarray(x.ravel()[0])

    def _fetch():
        t0 = time.perf_counter()
        _ = np.asarray(x.ravel()[0])
        return time.perf_counter() - t0

    rtt = min(_fetch() for _ in range(5))
    for T in (512, 1024):
        jf = jax.jit(lambda a, T=T: _transp_call(a, T))
        out = jf(x)
        ok = np.allclose(np.asarray(out[:64, :64]), np.asarray(x).T[:64, :64])

        def loop(iters):
            t0 = time.perf_counter()
            for _ in range(iters):
                o = jf(x)
            _ = np.asarray(o.ravel()[0])
            return (time.perf_counter() - t0 - rtt) / iters

        t = loop(8)
        iters = 8
        while t * iters < 1.0 and iters < 800:
            iters = min(800, max(iters * 4, int(1.5 / max(t, 1e-4))))
            t = loop(iters)
        gbps = 2 * N * N * 4 / t / 1e9
        print(f"transp T={T} {'OK' if ok else 'MISMATCH'} {t*1e3:7.3f} ms {gbps:7.1f} GB/s", flush=True)


def k_band():
    from dask_array_tpu.kernels.stencil import band_stencil_call

    def laplace(b):
        return (
            jnp.roll(b, 1, 0) + jnp.roll(b, -1, 0) + jnp.roll(b, 1, 1) + jnp.roll(b, -1, 1)
            - 4 * b
        )

    x = jnp.array(np.random.default_rng(0).standard_normal((512, 512), np.float32))
    out = band_stencil_call(x, laplace, (1, 1), ("reflect", "reflect"))
    ref = np.pad(np.asarray(x), 1, mode="symmetric")
    ref = (
        ref[:-2, 1:-1] + ref[2:, 1:-1] + ref[1:-1, :-2] + ref[1:-1, 2:]
        - 4 * np.asarray(x)
    )
    ok = np.allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    print("band", "OK" if ok else "MISMATCH", flush=True)


if __name__ == "__main__":
    {"copy": k_copy, "transp": k_transp, "band": k_band, "time_transp": time_transp}[
        sys.argv[1]
    ]()
