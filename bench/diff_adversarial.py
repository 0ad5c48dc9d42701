"""Adversarial differential: optimized vs unoptimized vs numpy.

Port of the reference's ``bench/diff_adversarial`` harness role: build
randomized hostile pipelines (sharing, slivers, mixed layouts, boundary
modes, masks) and assert three-way agreement — numpy ground truth, the
optimized compute, and the UNOPTIMIZED compute (optimizer off) — so any
divergence bisects immediately to the optimizer or the executor.

Run: python bench/diff_adversarial.py [n_cases]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_case(rng, da):
    """One randomized hostile pipeline; returns (collection, numpy)."""
    n = int(rng.integers(16, 60))
    m = int(rng.integers(8, 40))
    x = rng.standard_normal((n, m))
    c0 = int(rng.integers(1, max(2, n // 2)))
    c1 = int(rng.integers(1, max(2, m // 2)))
    if rng.integers(0, 4) == 0:
        # loader-leaf start: concatenated from_delayed row blocks — the
        # grouped FromMap collapse plus downstream cull/pushdown paths
        from dask_array_tpu.io._from_map import delayed, from_delayed

        edges = np.unique(rng.integers(1, n, size=max(1, n // 12)))
        bounds = [0, *edges.tolist(), n]
        parts = [
            from_delayed(
                delayed(lambda a: a)(x[lo:hi].copy()), shape=(hi - lo, m), dtype=x.dtype
            )
            for lo, hi in zip(bounds[:-1], bounds[1:])
            if hi > lo
        ]
        d = da.concatenate(parts, axis=0)
    else:
        d = da.from_array(x, chunks=(c0, c1))
    ref = x
    steps = int(rng.integers(2, 7))
    for _ in range(steps):
        op = rng.integers(0, 19)
        if op == 0 and not any(np.isnan(s) for s in (d.shape[0],)):
            a = int(rng.integers(0, max(1, d.shape[0] - 1)))
            b = int(rng.integers(a + 1, d.shape[0] + 1))
            d, ref = d[a:b], ref[a:b]
        elif op == 1:
            d, ref = d + d, ref + ref  # sharing
        elif op == 2 and d.ndim == 2:
            d, ref = d.T, ref.T
        elif op == 3:
            k = int(rng.integers(1, 5))
            d, ref = da.roll(d, k, axis=0), np.roll(ref, k, axis=0)
        elif op == 4 and d.ndim == 2 and d.shape[0] >= 4:
            d = da.map_overlap(
                lambda b: b * 1.0, d, depth={0: 1}, boundary="reflect", dtype=ref.dtype
            )
        elif op == 5:
            nc = int(rng.integers(1, max(2, d.shape[0])))
            d = d.rechunk({0: nc})
        elif op == 6 and d.ndim == 2:
            d, ref = d.sum(axis=1, keepdims=True) + d, ref.sum(axis=1, keepdims=True) + ref
        elif op == 7:
            d, ref = da.where(d > 0, d, -d), np.where(ref > 0, ref, -ref)
        elif op == 8 and d.ndim == 2:
            d, ref = da.concatenate([d, d], axis=1), np.concatenate([ref, ref], axis=1)
        elif op == 9 and d.ndim == 2 and d.shape[0] >= 3:
            d, ref = d[::-1, ::2], ref[::-1, ::2]  # negative step + stride
        elif op == 10 and d.shape[0] >= 2:
            # fancy take (exercises the round-3 reorder pushdowns)
            k = int(rng.integers(1, min(8, d.shape[0] + 1)))
            idx = rng.integers(0, d.shape[0], size=k)
            d, ref = d[idx], ref[np.asarray(idx)]
        elif op == 11 and d.ndim == 2 and d.shape[0] >= 2:
            # setitem (copy-on-write assignment)
            a = int(rng.integers(0, d.shape[0] - 1))
            v = float(rng.standard_normal())
            d = d.copy() if hasattr(d, "copy") else d
            d[a:a + 1, :] = v
            ref = ref.copy()
            ref[a:a + 1, :] = v
        elif op == 12 and d.ndim == 2:
            # stack then collapse the new axis
            d, ref = da.stack([d, -d], axis=0).sum(axis=0), np.stack([ref, -ref]).sum(axis=0)
        elif op == 13:
            d, ref = da.expand_dims(d, 0)[0], np.expand_dims(ref, 0)[0]
        elif op == 14 and d.ndim == 2:
            d, ref = da.flip(d, axis=1), np.flip(ref, axis=1)
        elif op == 15 and d.ndim == 2 and d.shape[1] % 2 == 0:
            # axis split (exercises slice-through-reshape pushdown when a
            # later slice lands on the preserved leading axis)
            d = d.reshape(d.shape[0], 2, d.shape[1] // 2)
            ref = ref.reshape(ref.shape[0], 2, ref.shape[1] // 2)
        elif op == 16 and d.ndim == 3:
            # trailing merge back to 2-D
            d = d.reshape(d.shape[0], d.shape[1] * d.shape[2])
            ref = ref.reshape(ref.shape[0], -1)
        elif op == 17 and d.shape[0] >= 5:
            # sliding-window reduction over the window axis (the
            # reduce_window fusion, incl. nan kinds and decomposed moments)
            w = int(rng.integers(2, min(6, d.shape[0])))
            red = ["sum", "mean", "max", "nansum", "var"][int(rng.integers(0, 5))]
            d = getattr(da, red)(da.sliding_window_view(d, w, axis=0), axis=-1)
            ref = getattr(np, red)(
                np.lib.stride_tricks.sliding_window_view(ref, w, axis=0), axis=-1
            )
        else:
            d, ref = np.sin(d), np.sin(ref)
    if d.ndim >= 1 and rng.integers(0, 8) == 0 and d.size:
        # terminal quantile lane: a random Hyndman-Fan method over a random
        # axis — the host-table index path must match numpy bit-for-bit on
        # index selection (values may differ by chain rounding only)
        methods = [
            "linear", "lower", "higher", "midpoint", "nearest",
            "inverted_cdf", "averaged_inverted_cdf", "closest_observation",
            "interpolated_inverted_cdf", "hazen", "weibull",
            "median_unbiased", "normal_unbiased",
        ]
        method = methods[int(rng.integers(0, len(methods)))]
        q = float(rng.integers(0, 101)) / 100.0
        axis = int(rng.integers(0, d.ndim))
        dq = da.nanquantile(d, q, axis=axis, method=method)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            rq = np.nanquantile(ref, q, axis=axis, method=method)
        return dq, rq
    if d.ndim >= 1 and rng.integers(0, 8) == 0:
        # terminal histogram lane (counts must agree exactly)
        # pad the range: binning exactly at the data min/max is 1-ulp
        # sensitive to numpy-vs-XLA rounding of the upstream chain
        if ref.size:
            span = float(np.nanmax(ref) - np.nanmin(ref)) or 1.0
            lo = float(np.nanmin(ref)) - 0.05 * span
            hi = float(np.nanmax(ref)) + 0.05 * span
        else:
            lo, hi = 0.0, 1.0
        h, _ = da.histogram(d, bins=8, range=(lo, hi))
        hr, _ = np.histogram(ref, bins=8, range=(lo, hi))
        return h, hr
    return d.sum(axis=0), ref.sum(axis=0)


def main(n_cases=50):
    import dask_array_tpu as da
    from dask_array_tpu import config

    failures = 0
    for i in range(n_cases):
        rng = np.random.default_rng(1000 + i)
        d, ref = build_case(rng, da)
        opt = np.asarray(d.compute())
        with config.set({"array.optimize-graph": False}):
            raw = np.asarray(d.compute())
        ok_opt = np.allclose(opt, ref, rtol=1e-9, atol=1e-9)
        ok_raw = np.allclose(raw, ref, rtol=1e-9, atol=1e-9)
        if not (ok_opt and ok_raw):
            failures += 1
            which = "optimizer" if (ok_raw and not ok_opt) else (
                "executor" if (not ok_raw and not ok_opt) else "lowering-only"
            )
            print(f"case {i}: MISMATCH ({which})")
    print(f"diff_adversarial: {n_cases - failures}/{n_cases} agree (3-way)")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(int(sys.argv[1]) if len(sys.argv) > 1 else 50) else 0)
