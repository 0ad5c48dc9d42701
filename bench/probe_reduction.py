"""Probe: one-pass formulations of the multi-statistic reduction workload.

The reduction_tree_10k bench row computes sum(axis=0), mean(axis=1) and
std() of one 10000^2 f32 array in one program.  The naive lowering emits
one HBM pass per distinct reduce-dimension set (~3-4 reads); the target
is ONE read (400 MB -> ~0.65 ms at the measured ~620 GB/s stream bound).

Variants:
  copy       x*1.0000001                       (stream bound reference)
  triple     x.sum(0), x.sum(1)/N, moments-std (what the workload lowers to)
  pairfuse   {sum(0), (x*x).sum(0)} same-dims pair + sum(1): 2 passes if
             XLA multi-output-fuses the same-dims pair
  scan1p     lax.scan over row tiles; carry colsum/s/ss, emit rowsums:
             1 pass if XLA fuses the 4 tile reductions into one tile read
  pallas     multi-statistic kernel: VMEM accumulators for colsum/s/ss,
             per-tile rowsum output (run standalone: remote Mosaic
             compiler may SIGABRT)

Run on the real chip:  python bench/probe_reduction.py [all|pallas]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

N = 10000
NBYTES = N * N * 4


def triple(x):
    s0 = x.sum(0)
    m1 = x.mean(1)
    sd = x.std()
    return s0, m1, sd


def pairfuse(x):
    s0 = x.sum(0)
    sq0 = (x * x).sum(0)
    m1 = x.sum(1) / np.float32(N)
    tot = s0.sum()
    n = np.float32(N) * np.float32(N)
    sd = jnp.sqrt(sq0.sum() / n - (tot / n) ** 2)
    return s0, m1, sd


def scan1p(x, rows=200):
    t = N // rows
    x3 = x.reshape(t, rows, N)

    def body(carry, tile):
        cs, s, ss = carry
        return (
            cs + tile.sum(0),
            s + tile.sum(),
            ss + (tile * tile).sum(),
        ), tile.sum(1)

    (cs, s, ss), rsums = lax.scan(
        body, (jnp.zeros((N,), jnp.float32), jnp.float32(0), jnp.float32(0)), x3
    )
    n = np.float32(N) * np.float32(N)
    sd = jnp.sqrt(ss / n - (s / n) ** 2)
    return cs, rsums.reshape(-1) / np.float32(N), sd


def pallas_mstat(x, rows=200):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = N // rows

    def kern(x_ref, col_ref, row_ref, s_ref):
        i = pl.program_id(0)
        tile = x_ref[:]

        @pl.when(i == 0)
        def _init():
            col_ref[:] = jnp.zeros_like(col_ref)
            s_ref[:] = jnp.zeros_like(s_ref)

        col_ref[:] += tile.sum(0)[None, :]
        row_ref[:] = tile.sum(1)[:, None]
        s_ref[:] += jnp.stack(
            [tile.sum(), (tile * tile).sum()]
        ).reshape(1, 2)

    col, rowc, s2 = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ),
        grid=(t,),
        in_specs=[pl.BlockSpec((rows, N), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
    )(x)
    n = np.float32(N) * np.float32(N)
    sd = jnp.sqrt(s2[0, 1] / n - (s2[0, 0] / n) ** 2)
    return col[0], rowc[:, 0] / np.float32(N), sd


def copy(x):
    return x * np.float32(1.0000001)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("host gen...", flush=True)
    host = np.random.default_rng(0).standard_normal((N, N)).astype(np.float32)
    print("device put...", flush=True)
    x = jnp.array(host)
    _ = np.asarray(x.ravel()[0])
    print("device ready", flush=True)

    def _fetch():
        t0 = time.perf_counter()
        _ = np.asarray(x.ravel()[0])
        return time.perf_counter() - t0

    rtt = min(_fetch() for _ in range(5))
    print(f"rtt {rtt*1e3:.2f} ms", flush=True)

    variants = {
        "copy": copy,
        "triple": triple,
        "pairfuse": pairfuse,
        "scan1p": scan1p,
        "scan_r100": lambda v: scan1p(v, rows=100),
        "scan_r400": lambda v: scan1p(v, rows=400),
        "scan_r1000": lambda v: scan1p(v, rows=1000),
        "pallas": pallas_mstat,
        "pallas_r500": lambda v: pallas_mstat(v, rows=500),
    }
    if which != "all":
        variants = {k: v for k, v in variants.items() if k.startswith(which)}
        if "triple" not in variants:
            variants = {"triple": triple, **variants}
    else:
        # SIGABRT risk: run pallas standalone
        variants = {k: v for k, v in variants.items() if not k.startswith("pallas")}

    ref = None
    for name, fn in variants.items():
        try:
            jf = jax.jit(fn)
            out = jf(x)
            outs = out if isinstance(out, tuple) else (out,)
            _ = [np.asarray(o.ravel()[0]) for o in outs]
            if name == "triple":
                ref = [np.asarray(o) for o in outs]
            if ref is not None and name not in ("copy", "triple"):
                got = [np.asarray(o) for o in outs]
                ok = all(
                    np.allclose(g, r, rtol=2e-4, atol=2e-3) for g, r in zip(got, ref)
                )
                print(f"parity {name:9s} {'OK' if ok else 'MISMATCH'}", flush=True)

            def loop(iters):
                t0 = time.perf_counter()
                for _ in range(iters):
                    o = jf(x)
                o = o[0] if isinstance(o, tuple) else o
                _ = np.asarray(o.ravel()[0])
                return (time.perf_counter() - t0 - rtt) / iters

            t = loop(8)
            iters = 8
            while t * iters < 1.0 and iters < 1600:
                iters = min(1600, max(iters * 4, int(1.5 / max(t, 1e-4))))
                t = loop(iters)
            bytes_ = 2 * NBYTES if name == "copy" else NBYTES
            print(
                f"{name:9s} {t*1e3:7.3f} ms  {bytes_/t/1e9:7.1f} GB/s"
                f" ({'rw' if name == 'copy' else '1-read'})",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:9s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
