"""Headline benchmark: blocked matmul through the full framework path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The BASELINE.md target is >=90% of peak MXU TFLOP/s on the chip for an
8192x8192 chunked (1024) matmul built through the lazy expression API.
``vs_baseline`` is achieved_TFLOPs / (0.90 * peak_TFLOPs): >=1.0 meets the
target.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _peak_tflops(device) -> float:
    """Best-known peak bf16 MXU TFLOP/s per chip by device kind."""
    kind = getattr(device, "device_kind", "").lower()
    table = {
        "tpu v5 lite": 197.0,  # v5e: 197 bf16 TFLOP/s
        "tpu v5e": 197.0,
        "tpu v5": 459.0,       # v5p
        "tpu v4": 275.0,
        "tpu v6 lite": 918.0,  # v6e (Trillium)
        "tpu v6e": 918.0,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return 197.0


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import jax

    import dask_array_tpu as da

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    n = 8192 if on_tpu else 2048
    chunk = 1024 if on_tpu else 512
    dtype = np.dtype("float32")

    rng = np.random.default_rng(0)
    a_np = rng.standard_normal((n, n)).astype(dtype)
    b_np = rng.standard_normal((n, n)).astype(dtype)

    # bf16 inputs: the MXU-native dtype (the reference framework has no
    # dtype-specific fast path to compare against; BASELINE.md sets the
    # target as a fraction of chip peak)
    if on_tpu:
        a_np = a_np.astype(jax.numpy.bfloat16)
        b_np = b_np.astype(jax.numpy.bfloat16)
    with da.config.set({"tpu.matmul-precision": "default"}):
        a = da.from_array(a_np, chunks=chunk).persist()
        b = da.from_array(b_np, chunks=chunk).persist()

        y = a @ b

        # warmup: build + optimize + compile + run (forced to completion — on
        # the tunneled axon platform block_until_ready does not drain the
        # device queue, so sync via a host fetch of one output element)
        out = y.compute_device()
        _ = np.asarray(out[0, 0])

        # measure the host<->device fetch round-trip so it can be excluded
        # (it is tunnel latency, not device time)
        def _rtt():
            return min(_timed(lambda: np.asarray(out[0, 0])) for _ in range(5))

        rtt = _rtt()

        def _trial(iters):
            t0 = time.perf_counter()
            o = None
            for _ in range(iters):
                o = y.compute_device()
            _ = np.asarray(o[0, 0])  # drain the queue
            return time.perf_counter() - t0

        # the rtt swings tens of ms with tunnel health; a short trial lets
        # a STALE rtt subtraction move the result (one sick-session run
        # printed 210 TFLOP/s, above the 197 physical peak).  Grow the
        # trial until steady work dwarfs any rtt error, and subtract the
        # SMALLER of the before/after rtt samples (conservative).
        iters = 20 if on_tpu else 3
        el = _trial(iters)
        if on_tpu:
            est = max((el - rtt) / iters, 1e-4)
            iters = min(600, max(iters, int(1.5 / est) + 1))
        best = min(_trial(iters) for _trial_i in range(3))
        rtt = min(rtt, _rtt())
        dt = (best - rtt) / iters

    flops = 2.0 * n * n * n
    tflops = flops / dt / 1e12
    peak = _peak_tflops(dev)
    if on_tpu and tflops > peak:
        # physically impossible: timing noise, not speed — report the
        # work-inclusive lower bound and say why
        tflops = flops / (best / iters) / 1e12
        suspect_note = (
            f"rtt-corrected reading exceeded the {peak} TFLOP/s physical peak "
            "(tunnel timing noise); reporting the uncorrected lower bound"
        )
    else:
        suspect_note = None
    target = 0.90 * peak
    record = {
        "metric": f"blocked_matmul_{n}x{n}_chunks{chunk}_bf16_tflops_per_chip",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / target, 4),
    }
    # lane guard: a silent trace->eager demotion (e.g. a dtype
    # misclassification) shows up as a catastrophic number — name the
    # cause in the record instead of leaving a bare 0.00x
    from dask_array_tpu._diagnostics import tier_report

    tiers = tier_report(y)
    if tiers["counts"].get("trace", 0) != sum(tiers["counts"].values()):
        record["note"] = f"NOT fully on the compiled trace lane: {tiers['counts']}"
    elif suspect_note:
        record["note"] = suspect_note
    print(json.dumps(record))


def _orchestrate():
    """Supervise the measurement in a child process so a sick axon tunnel
    (multi-minute hangs at jax init / first compile — see CLAUDE.md) cannot
    leave the driver with NO output: one TPU attempt with a generous
    timeout, then a CPU-lane fallback, always printing exactly one JSON
    line."""
    import os
    import subprocess
    import sys

    def run(extra_env, timeout):
        env = dict(os.environ, DA_BENCH_CHILD="1", **extra_env)
        if "JAX_PLATFORMS" in extra_env:
            env.pop("PALLAS_AXON_POOL_IPS", None)  # skip axon registration
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=timeout, capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            return None
        for line in reversed((out.stdout or "").strip().splitlines()):
            if line.startswith("{"):
                return line
        return None

    line = run({}, timeout=2400)
    if line is None:
        print("bench.py: TPU attempt hung/failed; falling back to the CPU lane", file=sys.stderr)
        line = run({"JAX_PLATFORMS": "cpu"}, timeout=1200)
    if line is None:
        line = json.dumps(
            {
                "metric": "blocked_matmul_bf16_tflops_per_chip",
                "value": 0.0,
                "unit": "TFLOP/s",
                "vs_baseline": 0.0,
                "note": "device unreachable (axon tunnel down) and CPU fallback failed",
            }
        )
    print(line)


if __name__ == "__main__":
    import os

    if os.environ.get("DA_BENCH_CHILD") == "1":
        main()
    else:
        _orchestrate()
