"""ctypes bindings for the native plan-algebra library (plankit).

Discipline mirrors the reference's native layer
(``/root/reference/dask_array/_frisky/base.py``): a build-generation
handshake fails LOUDLY on version skew, and every entry point has a Python
fallback — degrade, never miscompute.

Build: ``python -m dask_array_tpu.native`` (or automatic on first import).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

# must match plankit_generation() in plankit.cpp
PLANKIT_GENERATION = 5

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "plankit.cpp")
_SO = os.path.join(_HERE, f"libplankit-g{PLANKIT_GENERATION}.so")

_lib = None
_load_attempted = False


class StaleNativeBuild(RuntimeError):
    """The compiled plankit library does not match this wrapper's generation."""


def build(force: bool = False) -> str | None:
    """Compile plankit.cpp -> libplankit.so (returns path or None)."""
    if os.path.exists(_SO) and not force:
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO
    except Exception as e:
        warnings.warn(f"plankit native build failed ({e}); using Python fallbacks")
        return None


def _load():
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    path = _SO if os.path.exists(_SO) else build()
    if path is None or not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError as e:
        warnings.warn(f"plankit load failed ({e}); using Python fallbacks")
        return None
    lib.plankit_generation.restype = ctypes.c_int64
    gen = lib.plankit_generation()
    if gen != PLANKIT_GENERATION:
        # loud failure, like the reference's stale-.so check
        raise StaleNativeBuild(
            f"libplankit generation {gen} != wrapper generation "
            f"{PLANKIT_GENERATION}; rebuild with "
            "`python -m dask_array_tpu.native --force`"
        )
    i64 = ctypes.c_int64
    p64 = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
    lib.sliced_blockdim_pos.restype = i64
    lib.sliced_blockdim_pos.argtypes = [p64, i64, i64, i64, i64, p64]
    lib.old_to_new_axis.restype = i64
    lib.old_to_new_axis.argtypes = [p64, i64, p64, i64, p64, p64, p64, p64, i64]
    lib.refine_axis.restype = i64
    lib.refine_axis.argtypes = [p64, i64, p64, i64, p64, i64]
    lib.hash_bytes.restype = ctypes.c_uint64
    lib.hash_bytes.argtypes = [ctypes.c_char_p, i64]
    lib.expand_grid.restype = i64
    lib.expand_grid.argtypes = [p64, i64, p64, i64]
    lib.moved_fraction_axis.restype = ctypes.c_double
    lib.moved_fraction_axis.argtypes = [p64, i64, p64, i64]
    lib.coarse_axis.restype = i64
    lib.coarse_axis.argtypes = [p64, i64, p64, i64, p64, i64]
    lib.stage_degree_axis.restype = i64
    lib.stage_degree_axis.argtypes = [p64, i64, p64, i64]
    pu8 = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
    lib.plan_encode.restype = i64
    lib.plan_encode.argtypes = [p64, i64, pu8, p64, i64, pu8, i64]
    lib.plan_validate.restype = i64
    lib.plan_validate.argtypes = [pu8, i64, p64]
    lib.fingerprint128.restype = None
    lib.fingerprint128.argtypes = [
        pu8,
        i64,
        np.ctypeslib.ndpointer(dtype=np.uint64, flags="C_CONTIGUOUS"),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# python-facing wrappers (None on decline -> caller uses the Python path)
# ---------------------------------------------------------------------------


def sliced_blockdim_counts(chunks, start, stop, step):
    """Per-block selected counts for a positive-step normalized slice."""
    lib = _load()
    if lib is None or step <= 0:
        return None
    arr = np.asarray(chunks, dtype=np.int64)
    counts = np.empty(len(arr), dtype=np.int64)
    lib.sliced_blockdim_pos(arr, len(arr), int(start), int(stop), int(step), counts)
    return counts


def old_to_new_axis(old_chunks, new_chunks):
    """(offsets, piece_old, piece_lo, piece_hi) or None to decline."""
    lib = _load()
    if lib is None:
        return None
    oldc = np.asarray(old_chunks, dtype=np.int64)
    newc = np.asarray(new_chunks, dtype=np.int64)
    max_pieces = len(oldc) + 2 * len(newc) + 8
    piece_old = np.empty(max_pieces, dtype=np.int64)
    piece_lo = np.empty(max_pieces, dtype=np.int64)
    piece_hi = np.empty(max_pieces, dtype=np.int64)
    offsets = np.empty(len(newc) + 1, dtype=np.int64)
    n = lib.old_to_new_axis(
        oldc, len(oldc), newc, len(newc), piece_old, piece_lo, piece_hi, offsets, max_pieces
    )
    if n < 0:
        return None
    return offsets, piece_old[:n], piece_lo[:n], piece_hi[:n]


def refine_axis(a, b):
    """Common refinement of two blockdims, or None to decline."""
    lib = _load()
    if lib is None:
        return None
    aa = np.asarray(a, dtype=np.int64)
    bb = np.asarray(b, dtype=np.int64)
    max_out = len(aa) + len(bb) + 2
    out = np.empty(max_out, dtype=np.int64)
    n = lib.refine_axis(aa, len(aa), bb, len(bb), out, max_out)
    if n < 0:
        return None
    return tuple(int(x) for x in out[:n])


def hash_bytes(data: bytes):
    """Fast non-cryptographic FNV-1a fingerprint (diagnostics/dedup probes).

    NOT used for expression tokens: content addressing needs blake2b's
    collision resistance (see utils/_tokenize.py).
    """
    lib = _load()
    if lib is None:
        return None
    return lib.hash_bytes(data, len(data))


def expand_grid(nblocks):
    lib = _load()
    if lib is None:
        return None
    nb = np.asarray(nblocks, dtype=np.int64)
    total = int(np.prod(nb)) if len(nb) else 1
    coords = np.empty((total, max(1, len(nb))), dtype=np.int64)
    n = lib.expand_grid(nb, len(nb), coords, total)
    if n < 0:
        return None
    return coords[:, : len(nb)]


def moved_fraction_axis(src, dst):
    """Min-model moved fraction along one axis, or None to decline."""
    lib = _load()
    if lib is None:
        return None
    s = np.asarray(src, dtype=np.int64)
    d = np.asarray(dst, dtype=np.int64)
    out = lib.moved_fraction_axis(s, len(s), d, len(d))
    if out < 0:
        return None
    return float(out)


def coarse_axis(a, b):
    """Coarsest common coarsening of two blockdims, or None to decline."""
    lib = _load()
    if lib is None:
        return None
    aa = np.asarray(a, dtype=np.int64)
    bb = np.asarray(b, dtype=np.int64)
    max_out = min(len(aa), len(bb)) + 1
    out = np.empty(max_out, dtype=np.int64)
    n = lib.coarse_axis(aa, len(aa), bb, len(bb), out, max_out)
    if n < 0:
        return None
    return tuple(int(x) for x in out[:n])


def stage_degree_axis(old_chunks, new_chunks):
    """Max old-blocks-per-new-block fan-in along one axis, or None."""
    lib = _load()
    if lib is None:
        return None
    o = np.asarray(old_chunks, dtype=np.int64)
    n = np.asarray(new_chunks, dtype=np.int64)
    return int(lib.stage_degree_axis(o, len(o), n, len(n)))


def plan_encode(codes, strblob: bytes, stroffs):
    """Encode a plan tape into the versioned binary grammar, or None.

    Returns the encoded blob (bytes) or None to decline (native library
    unavailable).  A malformed tape raises: the tape is produced by our own
    flattener, so malformation is a bug, not an input condition.
    """
    lib = _load()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.int64)
    offs = np.ascontiguousarray(stroffs, dtype=np.int64)
    blob = np.frombuffer(strblob, dtype=np.uint8) if strblob else np.empty(0, np.uint8)
    blob = np.ascontiguousarray(blob)
    # worst case: every tape int becomes 8 output bytes, plus string table
    cap = 16 + 8 * len(codes) + len(blob) + 8 * len(offs)
    out = np.empty(cap, dtype=np.uint8)
    n = lib.plan_encode(codes, len(codes), blob, offs, len(offs) - 1, out, cap)
    if n == -1:  # pragma: no cover - cap is a proven upper bound
        raise RuntimeError("plan_encode capacity underestimate (bug)")
    if n == -2:
        raise ValueError("malformed plan tape (flattener bug)")
    return out[:n].tobytes()


def plan_validate(blob: bytes):
    """Re-parse an encoded plan.  Returns an info dict, or None to decline
    (native unavailable).  Raises ValueError on a malformed blob or an
    unknown grammar version — never guesses (reference discipline:
    common.rs grammar-version rejection)."""
    lib = _load()
    if lib is None:
        return None
    arr = np.frombuffer(blob, dtype=np.uint8) if blob else np.empty(0, np.uint8)
    arr = np.ascontiguousarray(arr)
    info = np.zeros(4, dtype=np.int64)
    n = lib.plan_validate(arr, len(arr), info)
    if n == -2:
        raise ValueError(
            f"unknown plan grammar version {blob[0] if blob else '?'} "
            "(library/wrapper skew)"
        )
    if n < 0:
        raise ValueError("malformed plan blob")
    return {
        "version": int(info[0]),
        "n_strings": int(info[1]),
        "n_nodes": int(info[2]),
        "n_ops": int(info[3]),
    }


def fingerprint128(data: bytes):
    """128-bit FNV-1a fingerprint as a 32-hex string, or None to decline."""
    lib = _load()
    if lib is None:
        return None
    arr = np.frombuffer(data, dtype=np.uint8) if data else np.empty(0, np.uint8)
    arr = np.ascontiguousarray(arr)
    out = np.zeros(2, dtype=np.uint64)
    lib.fingerprint128(arr, len(arr), out)
    return f"{int(out[0]):016x}{int(out[1]):016x}"
