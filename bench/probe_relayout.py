"""Probe: raw XLA variants of the 8192^2 f32 physical transpose.

Measures the achievable ceiling for the rechunk_relayout workload
(BASELINE metric 2's single-chip HBM form).  Finding (v5e-1 via axon,
2026-08-17): a pure read+write COPY stream measures ~656 GB/s — the
~819 GB/s HBM figure is not achievable for a 50/50 read+write stream on
this chip, so the relayout's 639 GB/s was already ~97 % of the real
machine bound.  (A donated `x * 1.0` measures "3181 GB/s" because XLA
elides the copy into a buffer alias — excluded below with a non-unit
multiplier.)

Run on the real chip: python bench/probe_relayout.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

N = 8192
NBYTES = N * N * 4


def fresh():
    x = jnp.array(np.random.default_rng(0).standard_normal((N, N), np.float32))
    _ = np.asarray(x.ravel()[0])
    return x


def timeit(fn, donate=False):
    jf = jax.jit(fn, donate_argnums=(0,) if donate else ())
    if donate:
        # ping-pong: feed the output back in so every call donates a live
        # buffer (square transpose keeps the shape)
        def loop(iters):
            cur = fresh()
            t0 = time.perf_counter()
            for _ in range(iters):
                cur = jf(cur)
            _ = np.asarray(cur.ravel()[0])
            return (time.perf_counter() - t0 - rtt) / iters

    else:
        x = fresh()

        def loop(iters):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = jf(x)
            _ = np.asarray(out.ravel()[0])
            return (time.perf_counter() - t0 - rtt) / iters

    t = loop(8)
    iters = 8
    while t * iters < 1.0 and iters < 800:
        iters = min(800, max(iters * 4, int(1.5 / max(t, 1e-4))))
        t = loop(iters)
    return t


def main():
    x = fresh()
    global rtt

    def _fetch():
        t0 = time.perf_counter()
        _ = np.asarray(x.ravel()[0])
        return time.perf_counter() - t0

    rtt = min(_fetch() for _ in range(5))
    print(f"rtt {rtt*1e3:.2f} ms", flush=True)

    B = 128
    variants = {
        # non-unit multiplier so donation cannot alias the copy away
        "copy": (lambda a: a * np.float32(1.0000001), False),
        "copy_donate": (lambda a: a * np.float32(1.0000001), True),
        "transp": (lambda a: a.T, False),
        "transp_donate": (lambda a: a.T, True),
        "tiled128": (
            lambda a: a.reshape(N // B, B, N // B, B)
            .transpose(2, 3, 0, 1)
            .reshape(N, N),
            False,
        ),
    }
    for name, (fn, donate) in variants.items():
        try:
            t = timeit(fn, donate)
            print(
                f"{name:14s} {t*1e3:7.3f} ms  {2*NBYTES/t/1e9:7.1f} GB/s (rw)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
