"""Probe: MXU-accumulated histogram vs the shipped VPU compare-scan.

The shipped kernel (kernels/histogram.py) does 2*N*B VPU ops per pass:
an (TILE, B) compare and an int32 sum over the tile axis.  The sum half
can ride the MXU instead: cast the 0/1 compare matrix to bf16 and
contract it with a ones vector — MXU accumulation is f32, so per-tile
counts (<= 131072 < 2^24) stay exact, and the cross-tile carry stays
int32.  If the VPU sum is ~half the runtime this is a ~2x; if XLA
already fuses the sum efficiently it is nothing.  The ones vector is a
JIT ARGUMENT so the algebraic simplifier cannot rewrite dot(ones, X)
back into the reduce we are trying to move.

Run on the real chip: python bench/probe_hist_mxu.py
Decision record: bench/README.md (win-or-delete, SURVEY §2.5).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

N = 64 * 1024 * 1024
NBINS = 256
TILE = 128 * 1024


def _edges():
    e = np.linspace(-4.0, 4.0, NBINS + 1).astype(np.float32)
    e[-1] = np.nextafter(e[-1], np.inf)
    return jnp.asarray(e)


@jax.jit
def scan_vpu(data, edges):
    d = data.reshape(N // TILE, TILE)

    def body(acc, tile):
        cmp = tile[:, None] < edges[None, :]
        return acc + jnp.sum(cmp, axis=0, dtype=jnp.int32), None

    init = jnp.zeros((edges.shape[0],), jnp.int32)
    cum, _ = jax.lax.scan(body, init, d)
    return cum[1 : NBINS + 1] - cum[:NBINS]


@jax.jit
def scan_mxu(data, edges, ones_row):
    d = data.reshape(N // TILE, TILE)

    def body(acc, tile):
        cmp = (tile[:, None] < edges[None, :]).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            ones_row, cmp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc + part.astype(jnp.int32), None

    init = jnp.zeros((edges.shape[0],), jnp.int32)
    cum, _ = jax.lax.scan(body, init, d)
    return cum[1 : NBINS + 1] - cum[:NBINS]


def _bench(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(out[:1])  # sync through the tunnel (block_until_ready no-ops)
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[:1])
        best = min(best, time.perf_counter() - t0)
    return out, best


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    host = rng.standard_normal(N).astype(np.float32)
    data = jnp.asarray(host)
    edges = _edges()
    ones_row = jnp.ones((TILE,), jnp.bfloat16)

    want, _ = np.histogram(host, bins=np.linspace(-4.0, 4.0, NBINS + 1))

    got_v, t_v = _bench(scan_vpu, data, edges)
    ok_v = np.array_equal(np.asarray(got_v), want)
    print(f"vpu scan:  {t_v*1e3:8.2f} ms  exact={ok_v}", flush=True)

    got_m, t_m = _bench(scan_mxu, data, edges, ones_row)
    ok_m = np.array_equal(np.asarray(got_m), want)
    print(f"mxu scan:  {t_m*1e3:8.2f} ms  exact={ok_m}", flush=True)
    print(f"speedup: {t_v / t_m:.2f}x", flush=True)
