"""tsqr_svd roofline probe: per-stage breakdown + a derived machine bound.

VERDICT r3 weak-item 3: every other bench row frames its number against a
measured machine bound; the fused CholeskyQR3+eigh SVD (13.6 ms for
1e6x128 f32 = 512 MB) had none.  This probe measures, in ONE session:

  * the copy-stream r+w bound,
  * each pipeline stage's DEVICE time — the axon tunnel has a ~4 ms
    per-dispatch floor that swamps sub-5-ms stages, so every stage runs
    K times inside one jitted ``lax.fori_loop`` (carry-dependent so XLA
    cannot hoist it) and the per-iteration time is the TWO-POINT SLOPE
    between K=8 and K=32, cancelling dispatch and loop overhead,
  * the full fused u+s+vh program (the bench_suite row),

then derives the serial machine bound: the pipeline is a data-dependent
chain (G1 -> chol1 -> Q1 -> G2 -> chol2 -> Q2 -> G3 -> chol3 -> eigh ->
U), so the bound is the sum over stages of the better of the stage's
bytes at the stream rate and its flops at the achieved matmul rate.

Run from the repo root: `python bench/probe_tsqr.py`.
Decision record: bench/README.md ("tsqr_svd roofline").
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS, COLS = 1_000_000, 128
NBYTES = ROWS * COLS * 4  # 512 MB f32


def _sync(x):
    """Scalar fetch: block_until_ready is a no-op through the axon tunnel."""
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


def _slope_time(make_loop, label, *args):
    """Per-iteration device time of a stage via the K=8 vs K=32 slope.

    Arrays go in as jit ARGUMENTS — closed-over constants are embedded in
    the program and overflow the axon remote-compile request (HTTP 413).
    """
    f8, f32_ = make_loop(8), make_loop(32)
    _sync(f8(*args))  # compile
    _sync(f32_(*args))
    t8 = min(_timed(f8, args) for _ in range(3))
    t32 = min(_timed(f32_, args) for _ in range(3))
    per = (t32 - t8) / 24
    print(f"{label}: {per*1e3:.3f} ms/iter (K8 {t8*1e3:.1f} ms, K32 {t32*1e3:.1f} ms)")
    return per


def _timed(fn, args=()):
    t0 = time.perf_counter()
    _sync(fn(*args))
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}")

    # --- copy-stream bound --------------------------------------------------
    buf = jnp.asarray(np.random.default_rng(0).standard_normal(
        (8192, 8192)).astype("f4"))

    def mk_copy(k):
        @jax.jit
        def run(b):
            def body(i, v):
                return v * jnp.float32(1.0000001)  # non-unit: no aliasing
            return jax.lax.fori_loop(0, k, body, b)
        return run

    t_copy = _slope_time(mk_copy, "copy-stream (512 MB r+w)", buf)
    stream = 2 * buf.nbytes / t_copy
    print(f"  -> {stream/1e9:.0f} GB/s")

    a = jnp.asarray(np.random.default_rng(1).standard_normal(
        (ROWS, COLS)).astype("f4"))
    w0 = jnp.asarray(np.random.default_rng(2).standard_normal(
        (COLS, COLS)).astype("f4") * 0.01)

    # --- tall matmul Q = A @ W (reads 512 MB, writes 512 MB) ----------------
    def mk_tall(k):
        @jax.jit
        def run(a_, w_):
            def body(i, w):
                q = jnp.matmul(a_, w, precision="highest")
                # consume EVERY row: a bare q[:COLS] carry lets XLA DCE the
                # tall matmul down to a_[:COLS] @ w (measured "5500 TFLOP/s")
                colsum = jnp.sum(q, axis=0)
                return q[:COLS, :] * jnp.float32(1e-3) + w_ + colsum[None, :] * jnp.float32(1e-9)
            return jax.lax.fori_loop(0, k, body, w_)
        return run

    t_tall = _slope_time(mk_tall, "tall matmul A@W (highest)", a, w0)
    flops = 2 * ROWS * COLS * COLS
    print(f"  -> {flops/t_tall/1e12:.1f} TFLOP/s, {2*NBYTES/t_tall/1e9:.0f} GB/s moved")

    # --- gram G = A^T A (reads 512 MB, writes 64 KB) ------------------------
    def mk_gram(k):
        @jax.jit
        def run(a_):
            def body(i, g):
                # fold the carry into the small operand side: XLA fuses the
                # broadcast-add into the dot's read of `a`
                ai = a_ + g[0, 0] * jnp.float32(1e-30)
                g2 = jnp.matmul(ai.T, ai, precision="highest")
                return (g2 + g2.T) * jnp.float32(0.5)
            return jax.lax.fori_loop(0, k, body, jnp.eye(COLS, dtype="f4"))
        return run

    t_gram = _slope_time(mk_gram, "gram A^T A (highest)", a)
    print(f"  -> {flops/t_gram/1e12:.1f} TFLOP/s, {NBYTES/t_gram/1e9:.0f} GB/s read")

    # --- small ops: chol + tri-inv, eigh (128 x 128) -------------------------
    g128 = jnp.matmul(w0.T, w0, precision="highest") + jnp.eye(COLS, dtype="f4")

    def mk_chol(k):
        import jax.scipy.linalg as jsl

        @jax.jit
        def run(g0):
            def body(i, g):
                l = jnp.linalg.cholesky(g)
                linv = jsl.solve_triangular(l, jnp.eye(COLS, dtype=g.dtype), lower=True)
                return g0 + linv * jnp.float32(1e-30)
            return jax.lax.fori_loop(0, k, body, g0)
        return run

    t_chol = _slope_time(mk_chol, "chol + tri-inv (128x128)", g128)

    def mk_eigh(k):
        @jax.jit
        def run(g0):
            def body(i, g):
                wv, v = jnp.linalg.eigh(g)
                return g0 + (v * wv[None, :]) @ v.T * jnp.float32(1e-30)
            return jax.lax.fori_loop(0, k, body, g0)
        return run

    t_eigh = _slope_time(mk_eigh, "eigh (128x128)", g128)

    # --- rbg regen (512 MB write) -------------------------------------------
    import dask_array_tpu as da  # noqa: F401  (sets prng defaults)
    from dask_array_tpu import config

    key0 = jax.random.key(0, impl=config.get("tpu.prng-impl", "rbg"))

    def mk_regen(k):
        @jax.jit
        def run(key_):
            def body(i, c):
                key = jax.random.fold_in(key_, i)
                x = jax.random.normal(key, (ROWS, COLS), dtype="f4")
                return c + x[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    t_regen = _slope_time(mk_regen, "rbg regen (512 MB write)", key0)
    print(f"  -> {NBYTES/t_regen/1e9:.0f} GB/s written")

    # --- full fused pipeline over a PERSISTED input --------------------------
    x = da.random.default_rng(0).standard_normal(
        (ROWS, COLS), dtype="float32", chunks=(100_000, COLS)).persist()
    u_, s_, vh_ = da.linalg.svd(x)
    from dask_array_tpu._executor import execute_many
    from dask_array_tpu._materialize import optimize_expr

    lowered = [optimize_expr(v.expr) for v in (u_, s_, vh_)]
    outs = execute_many(lowered)
    _sync(outs[1])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            outs = execute_many(lowered)
        _sync(outs[1])
        times.append((time.perf_counter() - t0) / 10)
    t_full = min(times)
    print(f"fused u+s+vh (persisted input, 10-iter pipelined): {t_full*1e3:.2f} ms")

    # --- derived serial bound ------------------------------------------------
    mm_rate = flops / min(t_tall, t_gram)  # achieved rate incl. its own memory

    def stage(bytes_moved, stage_flops):
        return max(bytes_moved / stream, stage_flops / mm_rate)

    bound = (
        3 * stage(NBYTES, flops)       # G1 G2 G3 (read A/Q1/Q2)
        + 3 * t_chol + t_eigh          # small ops at measured speed
        + 3 * stage(2 * NBYTES, flops) # Q1 Q2 U (read + write 512 MB each)
    )
    alt = 3 * t_gram + 3 * t_tall + 3 * t_chol + t_eigh
    print(f"derived serial bound: {bound*1e3:.2f} ms "
          f"-> fused = {bound/t_full*100:.0f} % of bound")
    print(f"sum of measured stages: {alt*1e3:.2f} ms "
          f"-> fused = {alt/t_full*100:.0f} % of stage-sum")


if __name__ == "__main__":
    main()
