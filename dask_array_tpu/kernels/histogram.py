"""Fused multi-bin histogram / bincount: tiled compare-accumulate scan.

WHY NOT XLA's OWN LOWERING: ``jnp.histogram``/``jnp.bincount`` lower to a
scatter-add, which serializes on TPU — measured 6.5 s for 64M float32 /
256 bins on v5e (~0.04 GB/s).  This formulation replaces the scatter with
a compare-accumulate sweep that is pure VPU work: the data streams through
a ``lax.scan`` in 128K-element tiles, each tile is compared against every
bin edge at once (``d[:, None] < e[None, :]``), the per-tile partial
counts accumulate in the scan carry, and the per-bin counts fall out as a
first difference of the cumulative counts.  numpy's last-bin-inclusive
semantics come from replacing the final edge with ``nextafter(e_last,
+inf)`` so ``<`` acts as ``<=`` there.

HISTORY — this replaced a hand-written Pallas kernel (win-or-delete
discipline, SURVEY.md §2.5): the Pallas compare-accumulate ran the same
sweep in 123 ms because its 3-D broadcast compare forced Mosaic vector
relayouts, while XLA fuses this scan body's compare straight into the
tile reduction with native (8, 128) layouts — measured 17.7 ms for
64M x 256 on v5e, ~7x the Pallas kernel and ~370x the scatter.  A
per-edge-register privatized Pallas variant (the theoretical-bound
design) SIGABRTs this platform's remote Mosaic compiler.  Decision
record: bench/README.md.

f64 inputs run the same sweep on a TWO-FLOAT split: ``d`` is carried as
``(hi, lo) = (f32(d), f32(d - hi))`` and compared lexicographically —
pure 32-bit VPU ops, exact to ~2^-49 relative (the TPU has no 64-bit
ALU and its f64 emulation itself carries ~1e-15 ≈ 2^-50 error, see
``ops/_bitsafe.py``).

Parity role: the reference's ``HistogramBinned`` tree-sum
(``/root/reference/dask_array/_histogram.py:41``) — here ONE fused sweep
instead of a per-block bincount + tree.
"""

from __future__ import annotations

import functools

import numpy as np

# elements per scan tile: 128K f32 = 512 KiB, far under VMEM, large enough
# that the (TILE, n_edges) compare block amortizes loop overhead (measured
# best among 32K/64K/128K/256K on v5e: 20.9 ms vs 31/31/23)
_TILE = 128 * 1024


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(
    __import__("jax").jit,
    static_argnames=("nbins", "weighted", "exact64"),
)
def _histogram_scan(
    data, data_lo, edges, edges_lo, weights, nbins, weighted, exact64
):
    import jax
    import jax.numpy as jnp

    n_tiles = data.shape[0] // _TILE
    d_hi = data.reshape(n_tiles, _TILE)
    xs = (d_hi,)
    if exact64:
        xs += (data_lo.reshape(n_tiles, _TILE),)
    if weighted:
        xs += (weights.reshape(n_tiles, _TILE),)

    # unweighted counts accumulate in int32 (exact up to 2^31 per bin,
    # where float32 would silently lose counts past 2^24); weighted tiles
    # reduce in f32 but the cross-tile carry is f64 (a 64M-element f32
    # running sum drifts ~4e-2 in the tail bins, and the carry is only
    # n_edges wide so the emulated-f64 adds are free)
    acc_dtype = jnp.float64 if weighted else jnp.int32

    def body(acc, tile):
        it = iter(tile)
        d = next(it)
        if exact64:
            # two-float lexicographic compare (NaN: both legs false)
            dl = next(it)
            hi_lt = d[:, None] < edges[None, :]
            hi_eq = d[:, None] == edges[None, :]
            lo_lt = dl[:, None] < edges_lo[None, :]
            cmp = hi_lt | (hi_eq & lo_lt)
        else:
            cmp = d[:, None] < edges[None, :]
        if weighted:
            w = next(it)
            part = jnp.sum(jnp.where(cmp, w[:, None], 0.0), axis=0).astype(acc_dtype)
        else:
            part = jnp.sum(cmp, axis=0, dtype=acc_dtype)
        return acc + part, None

    init = jnp.zeros((edges.shape[0],), acc_dtype)
    cumulative, _ = jax.lax.scan(body, init, xs)
    out = cumulative[1:nbins + 1] - cumulative[:nbins]
    return out.astype(jnp.float32) if weighted else out


def _two_float_split(x64):
    """(hi, lo) f32 pair of an f64 value: hi = f32(x), lo = f32(x - hi).

    Lexicographic (hi, lo) order matches f64 order to ~2^-49 relative —
    the platform's own f64 emulation error floor.  NaN splits to
    (NaN, NaN), which self-excludes in the kernel's comparisons; ±inf
    keeps lo = 0 (inf - inf would be NaN and break inf-edge equality).
    """
    import jax.numpy as jnp

    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(x64.dtype)).astype(jnp.float32)
    lo = jnp.where(jnp.isinf(hi), jnp.float32(0), lo)
    return hi, lo


def histogram(data, edges, weights=None, *, interpret=False):
    """Histogram counts of ``data`` over ``edges`` (numpy semantics:
    half-open bins, last bin closed, NaN/out-of-range excluded).

    ``data`` any shape (flattened).  f32-exact dtypes compare directly;
    f64 runs the two-float exact path.  Returns counts of length
    ``len(edges) - 1`` (cast at the call site).  ``interpret`` is accepted
    for API compatibility with the retired Pallas kernel and ignored —
    the scan formulation runs natively on every backend.
    """
    import jax.numpy as jnp

    del interpret
    data = jnp.ravel(data)

    def _needs_two_float(dt):
        dt = np.dtype(dt)
        if dt.kind in "iu":
            # 32-bit ints exceed f32's 2^24 exact range but fit the
            # two-float path's ~2^48; smaller ints compare exactly in f32
            return dt.itemsize >= 4
        return dt.itemsize > 4

    exact64 = _needs_two_float(data.dtype) or _needs_two_float(edges.dtype)
    n = data.size
    nbins = int(edges.shape[0]) - 1
    n_pad = max(_round_up(n, _TILE), _TILE)

    if exact64:
        d64 = data.astype(jnp.float64)
        dh, dl = _two_float_split(d64)
        # NaN padding self-excludes (NaN < e is False for every edge)
        flat_h = jnp.full((n_pad,), jnp.nan, dtype=jnp.float32).at[:n].set(dh)
        flat_l = jnp.full((n_pad,), jnp.nan, dtype=jnp.float32).at[:n].set(dl)

        e64 = jnp.asarray(edges, dtype=jnp.float64)
        eh, el = _two_float_split(e64)
        # last edge: bump the LOW word so `<` acts as `<=` there (numpy's
        # inclusive last bin) without moving the hi word.  The bump must be
        # a NORMAL f32 (subnormals flush to zero in the VPU compare), and
        # min-normal (2^-126) is still far below any real f64 lo-word gap
        tiny = jnp.float32(np.finfo(np.float32).tiny)
        bumped = jnp.nextafter(el[nbins], jnp.float32(jnp.inf))
        bumped = jnp.where(jnp.abs(bumped) < tiny, jnp.maximum(el[nbins], 0) + tiny, bumped)
        el = el.at[nbins].set(bumped)
        edges_row, edges_lo_row = eh, el
        data_flat, data_lo_flat = flat_h, flat_l
    else:
        data_flat = jnp.full((n_pad,), jnp.nan, dtype=jnp.float32)
        data_flat = data_flat.at[:n].set(data.astype(jnp.float32))
        data_lo_flat = data_flat  # ignored

        e = jnp.asarray(edges, dtype=jnp.float32)
        # last edge -> nextafter so `<` realizes numpy's inclusive last bin
        edges_row = e.at[nbins].set(jnp.nextafter(e[nbins], jnp.float32(jnp.inf)))
        edges_lo_row = edges_row  # ignored

    weighted = weights is not None
    if weighted:
        wflat = jnp.zeros((n_pad,), dtype=jnp.float32)
        wflat = wflat.at[:n].set(jnp.ravel(weights).astype(jnp.float32))
    else:
        wflat = data_flat  # ignored

    return _histogram_scan(
        data_flat, data_lo_flat, edges_row, edges_lo_row, wflat,
        nbins, weighted, exact64,
    )


def use_pallas_histogram(dtype, weights_dtype=None):
    """Routing policy (config ``tpu.histogram-kernel``: auto|pallas|xla).

    auto: the fused compare-accumulate scan engages on TPU for f32-exact
    inputs (direct compare) and for f64 (two-float compare); CPU stays on
    ``jnp.histogram`` (no scatter pathology there).  ``pallas`` (name kept
    for config compatibility; the formulation is an XLA scan now) forces
    the scan on any backend — tests use it to exercise the kernel path on
    the CPU mesh.  f64 WEIGHTS stay on XLA: the scan accumulates weights
    in f32, which loses precision on large sums.

    Returns ``(enabled, interpret)``; ``interpret`` is always False now
    (retained so call sites keep a stable signature).
    """
    import jax

    from dask_array_tpu import config

    mode = config.get("tpu.histogram-kernel", "auto")
    if mode == "xla":
        return False, False
    import jax.numpy as jnp

    def f32_exact(d):
        d = np.dtype(d)
        if d.kind == "b" or (d.kind in "iu" and d.itemsize <= 2):
            return True  # bool / small ints are exact f32 values
        return d in (np.dtype("f4"), np.dtype("f2")) or d == jnp.bfloat16.dtype

    def supported(d):
        d = np.dtype(d)
        if d.kind in "iu" and d.itemsize == 4:
            return True  # 32-bit ints: exact on the two-float path
        # int64 declines: values past ~2^48 would mis-bin (XLA lane keeps
        # numpy semantics, slow but never wrong)
        return f32_exact(d) or d == np.dtype("f8")

    ok_dtype = supported(dtype)
    if weights_dtype is not None and not f32_exact(weights_dtype):
        ok_dtype = False
    on_tpu = jax.default_backend() not in ("cpu",)
    if mode == "pallas":
        return True, False
    return (ok_dtype and on_tpu), False
