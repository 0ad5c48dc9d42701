"""Probe: raw XLA formulations of the 4096^2 f32 depth-1 Laplace stencil.

Finds the machine's stencil speed-of-light to frame the stencil2d_4096
workload (bench_suite) against a *measured* bound rather than the 819
GB/s spec figure (a pure r+w copy stream measures ~666 GB/s on this
chip — see probe_relayout.py).

Variants (whole-array, ignoring boundary mode differences — all
interior-equivalent, which is what map_overlap's trim keeps):
  roll4       4x jnp.roll + arithmetic        (what the workload runs today)
  slices      pad once, 5 shifted slices      (fusable strided reads)
  rw_sum      two 1-D reduce_window sums      (laplace = row3+col3-6x)
  conv33      lax.conv 3x3 SAME               (MXU path)
  copy        x*1.0000001                     (stream bound reference)

Run on the real chip: python bench/probe_stencil.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

N = 4096
NBYTES = N * N * 4


def roll4(x):
    return (
        jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0) + jnp.roll(x, 1, 1) + jnp.roll(x, -1, 1)
        - 4 * x
    )


def slices(x):
    p = jnp.pad(x, 1)
    return (
        p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] - 4 * x
    )


def rw_sum(x):
    row3 = lax.reduce_window(x, 0.0, lax.add, (3, 1), (1, 1), "SAME")
    col3 = lax.reduce_window(x, 0.0, lax.add, (1, 3), (1, 1), "SAME")
    return row3 + col3 - 6 * x


_K = jnp.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], jnp.float32)


def conv33(x):
    return lax.conv_general_dilated(
        x[None, None],
        _K[None, None],
        (1, 1),
        "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]


def copy(x):
    return x * np.float32(1.0000001)


def main():
    x = jnp.array(np.random.default_rng(0).standard_normal((N, N), np.float32))
    _ = np.asarray(x.ravel()[0])

    def _fetch():
        t0 = time.perf_counter()
        _ = np.asarray(x.ravel()[0])
        return time.perf_counter() - t0

    rtt = min(_fetch() for _ in range(5))
    print(f"rtt {rtt*1e3:.2f} ms", flush=True)

    # value parity on the interior first
    ref = np.asarray(jax.jit(roll4)(x))[1:-1, 1:-1]
    for name, fn in [("slices", slices), ("rw_sum", rw_sum), ("conv33", conv33)]:
        got = np.asarray(jax.jit(fn)(x))[1:-1, 1:-1]
        ok = np.allclose(got, ref, rtol=1e-5, atol=1e-5)
        print(f"parity {name:8s} {'OK' if ok else 'MISMATCH'}", flush=True)

    for name, fn in [
        ("copy", copy),
        ("roll4", roll4),
        ("slices", slices),
        ("rw_sum", rw_sum),
        ("conv33", conv33),
    ]:
        try:
            jf = jax.jit(fn)
            out = jf(x)
            _ = np.asarray(out.ravel()[0])

            def loop(iters):
                t0 = time.perf_counter()
                for _ in range(iters):
                    o = jf(x)
                _ = np.asarray(o.ravel()[0])
                return (time.perf_counter() - t0 - rtt) / iters

            t = loop(8)
            iters = 8
            while t * iters < 1.0 and iters < 1600:
                iters = min(1600, max(iters * 4, int(1.5 / max(t, 1e-4))))
                t = loop(iters)
            print(
                f"{name:8s} {t*1e3:7.3f} ms  {2*NBYTES/t/1e9:7.1f} GB/s (rw)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:8s} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
