"""Gram-leg precision probe for the fused tsqr_svd (VERDICT r4 #4).

The round-4 roofline (bench/README.md "tsqr_svd roofline") books the
gram legs at 23.2 TFLOP/s = 70 % of the f32-`highest` MXU ceiling; the
fused u+s+vh sits at 82 % of the derived serial bound.  `highest` runs
SIX bf16 passes per f32 matmul; `high` runs THREE (bf16_3x) at ~2x the
rate.  CholeskyQR3 exists precisely to absorb gram-product error with an
extra correction pass — this probe measures whether switching the BIG
(m x n @ n x m) products to `high` (keeping the tiny n x n triple
products at `highest`) holds singular-value accuracy across conditioning,
and what it buys in wall time.

Accuracy reference: numpy f64 SVD of the same matrix (column-scaled
normal, cond 1e0..1e6).  Decision gate: max rel s-error within 2x of the
`highest` path at every tested conditioning, else NOT shipped.

Run from the repo root: `python bench/probe_gram_precision.py`.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS, COLS = 1_000_000, 128


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


def _svd_fused(a, big_precision):
    """CholeskyQR3-noQ + eigh s-values, big products at ``big_precision``."""
    import jax.numpy as jnp

    def gram(x):
        return jnp.matmul(x.conj().T, x, precision=big_precision)

    def chol_r(g, scale):
        # shifted cholesky (the production path's conditioning guard)
        n = g.shape[0]
        s = 11 * (n * n + n) * np.finfo(np.float32).eps * scale
        return jnp.linalg.cholesky(g + s * jnp.eye(n, dtype=g.dtype))

    g1 = gram(a)
    l1 = chol_r(g1, jnp.trace(g1))
    r1 = l1.T
    q1 = jnp.linalg.solve_triangular(
        l1, a.T, lower=True
    ).T if hasattr(jnp.linalg, "solve_triangular") else None
    if q1 is None:
        import jax

        q1 = jax.scipy.linalg.solve_triangular(l1, a.T, lower=True).T
    g2 = gram(q1)
    l2 = chol_r(g2, jnp.trace(g2))
    r2 = l2.T
    import jax

    q2 = jax.scipy.linalg.solve_triangular(l2, q1.T, lower=True).T
    g3 = gram(q2)
    l3 = chol_r(g3, jnp.trace(g3))
    r3 = l3.T
    r = jnp.matmul(
        r3, jnp.matmul(r2, r1, precision="highest"), precision="highest"
    )
    w, _ = jnp.linalg.eigh(jnp.matmul(r.conj().T, r, precision="highest"))
    return jnp.sqrt(jnp.maximum(w[::-1], 0.0))


def main():
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # accuracy sweep at a SMALLER m (accuracy is column-conditioning
    # driven, not row-count driven; 64k rows keeps host SVD tractable).
    # ONE jit per precision, reused across conditioning values — the
    # remote compile helper takes minutes per eigh-bearing program.
    m_acc = 65536
    base = rng.standard_normal((m_acc, COLS)).astype(np.float32)
    fns = {
        prec: jax.jit(lambda x, p=prec: _svd_fused(x, p))
        for prec in ("highest", "high", "default")
    }
    for cond_exp in (0, 2, 4, 6):
        scales = np.logspace(0, -cond_exp, COLS).astype(np.float32)
        a_np = base * scales[None, :]
        s_ref = np.linalg.svd(a_np.astype(np.float64), compute_uv=False)
        row = [f"cond=1e{cond_exp}"]
        for prec, f in fns.items():
            s = np.asarray(f(a_np))
            rel = np.max(np.abs(s - s_ref) / s_ref)
            row.append(f"{prec}: {rel:.2e}")
        print("  ".join(row), flush=True)

    # wall time of the fused s-values at full size, K-slope style
    a_big = rng.standard_normal((ROWS, COLS)).astype(np.float32)
    for prec in ("highest", "high"):

        def make(k, p=prec):
            def loop(x):
                import jax.lax as lax

                def body(_, carry):
                    s = _svd_fused(x + carry[0, 0] * 0, p)
                    return carry + s[None, :] * 1e-30

                return lax.fori_loop(0, k, body, jnp.zeros((1, COLS), jnp.float32))

            return jax.jit(loop)

        f8, f32_ = make(8), make(32)
        _sync(f8(a_big)), _sync(f32_(a_big))
        t8 = min(
            (lambda: (lambda t0: (_sync(f8(a_big)), time.perf_counter() - t0)[1])(
                time.perf_counter()
            ))()
            for _ in range(3)
        )
        t32 = min(
            (lambda: (lambda t0: (_sync(f32_(a_big)), time.perf_counter() - t0)[1])(
                time.perf_counter()
            ))()
            for _ in range(3)
        )
        per = (t32 - t8) / 24
        print(f"fused s-values precision={prec}: {per*1e3:.2f} ms/iter "
              f"(K8 {t8*1e3:.1f} ms, K32 {t32*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
