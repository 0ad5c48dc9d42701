"""Gram-leg precision probe for the fused tsqr_svd (VERDICT r4 #4).

The round-4 roofline (bench/README.md "tsqr_svd roofline") books the
gram legs at 23.2 TFLOP/s = 70 % of the f32-`highest` MXU ceiling; the
fused u+s+vh sits at 82 % of the derived serial bound.  `highest` runs
SIX bf16 passes per f32 matmul; `high` runs THREE (bf16_3x) at ~2x the
rate.  CholeskyQR3's shift schedule (16, 1, 0) exists precisely to
absorb gram-product error with correction passes, and the tall
``A @ R^-1`` legs are STREAM-bound (their precision doesn't matter for
wall time) — so only the gram products switch, via config
``tpu.gram-precision``, and this probe drives the PRODUCTION
``da.linalg.svd`` path at both settings:

* accuracy: singular values + reconstruction + U orthonormality vs a
  numpy f64 reference, across column conditioning 1e0..1e6, at
  65536 x 128 (conditioning-driven, not row-count-driven);
* wall: the 1e6 x 128 fused u+s+vh on a PERSISTED input, steady-state
  minimum of repeated computes (RTT noise bounded by taking min).

Decision gate (win-or-delete): ship `high` as the default only if every
accuracy metric stays within 2x of the `highest` path at every tested
conditioning AND the steady-state fused time improves by >= 1 ms.

Run from the repo root: `python bench/probe_gram_precision.py`.
Decision record: bench/README.md ("gram-precision", round 5).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def accuracy_sweep():
    import dask_array_tpu as da
    from dask_array_tpu import config

    rng = np.random.default_rng(0)
    m, n = 65536, 128
    base = rng.standard_normal((m, n)).astype(np.float32)
    for cond_exp in (0, 2, 4, 6):
        scales = np.logspace(0, -cond_exp, n).astype(np.float32)
        a_np = base * scales[None, :]
        s_ref = np.linalg.svd(a_np.astype(np.float64), compute_uv=False)
        row = [f"cond=1e{cond_exp}"]
        for prec in ("highest", "high"):
            with config.set({"tpu.gram-precision": prec}):
                x = da.from_array(a_np, chunks=(m // 4, n))
                u, s, vh = da.linalg.svd(x)
                u_np, s_np, vh_np = (
                    np.asarray(v) for v in da.compute(u, s, vh)
                )
            rel_s = float(np.max(np.abs(s_np - s_ref) / s_ref[0]))
            recon = float(
                np.max(np.abs(u_np @ np.diag(s_np) @ vh_np - a_np))
                / s_ref[0]
            )
            ortho = float(
                np.max(np.abs(u_np.T @ u_np - np.eye(n)))
            )
            row.append(
                f"{prec}: s {rel_s:.1e} recon {recon:.1e} ortho {ortho:.1e}"
            )
        print("  ".join(row), flush=True)


def wall_time():
    import dask_array_tpu as da
    from dask_array_tpu import config

    x = da.random.default_rng(0).standard_normal(
        (1_000_000, 128), dtype="float32", chunks=(100_000, 128)
    ).persist()
    for prec in ("highest", "high"):
        with config.set({"tpu.gram-precision": prec}):
            u, s, vh = da.linalg.svd(x)
            outs = da.compute(u, s, vh)  # compile + first run
            float(np.asarray(outs[1])[0])
            times = []
            for _ in range(12):
                t0 = time.perf_counter()
                outs = da.compute(u, s, vh)
                float(np.asarray(outs[1])[0])  # sync via tiny fetch
                times.append(time.perf_counter() - t0)
        print(
            f"fused u+s+vh precision={prec}: min {min(times)*1e3:.2f} ms, "
            f"median {sorted(times)[len(times)//2]*1e3:.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    import jax

    print(f"devices: {jax.devices()}", flush=True)
    accuracy_sweep()
    wall_time()
