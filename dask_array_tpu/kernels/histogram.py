"""Pallas TPU kernel: fused multi-bin histogram / bincount.

WHY A KERNEL: XLA lowers ``jnp.histogram``/``jnp.bincount`` to a
scatter-add, which serializes on TPU — measured 6.2 s for 64M float32 /
256 bins on v5e (~0.04 GB/s).  This kernel replaces the scatter with a
compare-accumulate sweep that is pure VPU work: for every 128-wide chunk
of bin edges, each data subtile is compared against the edges
(``d < e`` broadcast), partial counts accumulate in a VMEM row across the
grid, and the per-bin counts fall out as a first difference of the
cumulative counts.  numpy's last-bin-inclusive semantics come from
replacing the final edge with ``nextafter(e_last, +inf)`` so ``<`` acts
as ``<=`` there.

f64 inputs run the same sweep on a TWO-FLOAT split: ``d`` is carried as
``(hi, lo) = (f32(d), f32(d - hi))`` and compared lexicographically —
pure 32-bit VPU ops, exact to ~2^-49 relative (the TPU has no 64-bit
ALU and its f64 emulation itself carries ~1e-15 ≈ 2^-50 error, see
``ops/_bitsafe.py``; 64-bit bitcasts do not compile on this platform, so
integer keying is not available).

Parity role: the reference's ``HistogramBinned`` tree-sum
(``/root/reference/dask_array/_histogram.py:41``) — here ONE kernel pass
instead of a per-block bincount + tree (SURVEY.md §2.5 "TPU mapping
note": where XLA is weak, go Pallas).
"""

from __future__ import annotations

import functools

import numpy as np

_SUB = 32   # data rows per comparison block: (32, 128) elements x 128 edges
_ROWS = 512  # data rows per grid tile: 512*128 = 64K elements (256 KiB f32)
_LANE = 128


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(
    __import__("jax").jit,
    static_argnames=("nbins", "weighted", "exact64", "interpret"),
)
def _histogram_call(
    data3, data_lo3, edges_row, edges_lo_row, weights3, nbins, weighted, exact64, interpret
):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_tiles, rows, lane = data3.shape
    e_pad = edges_row.shape[1]
    n_chunks = e_pad // _LANE
    n_sub = rows // _SUB
    # unweighted counts accumulate in int32 (exact up to 2^31 per bin,
    # where float32 would silently lose counts past 2^24)
    acc_dtype = jnp.float32 if weighted else jnp.int32

    def kernel(*refs):
        it = iter(refs)
        edges_ref = next(it)
        edges_lo_ref = next(it) if exact64 else None
        data_ref = next(it)
        data_lo_ref = next(it) if exact64 else None
        w_ref = next(it) if weighted else None
        out_ref = next(it)

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for c in range(n_chunks):  # static: few 128-edge chunks
            e = edges_ref[:, c * _LANE:(c + 1) * _LANE]  # (1, 128)
            el = edges_lo_ref[:, c * _LANE:(c + 1) * _LANE] if exact64 else None

            def body(s, acc):
                # the fori index must stay i32 end to end (x64 would promote
                # a bare literal to i64 and trip Mosaic's index arithmetic)
                off = s * jnp.int32(_SUB)
                d = data_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)
                if exact64:
                    # two-float lexicographic compare (NaN: both legs false)
                    dl = data_lo_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)
                    hi_lt = d[:, :, None] < e[None, :, :]
                    hi_eq = d[:, :, None] == e[None, :, :]
                    lo_lt = dl[:, :, None] < el[None, :, :]
                    cmp = hi_lt | (hi_eq & lo_lt)
                else:
                    cmp = d[:, :, None] < e[None, :, :]  # (SUB, 128, 128)
                if weighted:
                    w = w_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)
                    part = jnp.sum(
                        jnp.where(cmp, w[:, :, None], 0.0), axis=(0, 1)
                    )
                else:
                    part = jnp.sum(cmp, axis=(0, 1), dtype=acc_dtype)
                return acc + part[None, :]

            vec = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(n_sub), body,
                jnp.zeros((1, _LANE), acc_dtype),
            )
            out_ref[:, c * _LANE:(c + 1) * _LANE] += vec

    # index maps pinned to i32: under jax_enable_x64 the traced index/
    # constants promote to i64, which Mosaic's index lowering rejects
    # ("failed to legalize operation 'func.return'")
    def _const_map(i):
        return (np.int32(0), np.int32(0))

    def _tile_map(i):
        return (jnp.asarray(i, jnp.int32), np.int32(0), np.int32(0))

    edge_spec = pl.BlockSpec((1, e_pad), _const_map, memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((1, rows, lane), _tile_map, memory_space=pltpu.VMEM)
    in_specs = [edge_spec]
    args = [edges_row]
    if exact64:
        in_specs.append(edge_spec)
        args.append(edges_lo_row)
    in_specs.append(tile_spec)
    args.append(data3)
    if exact64:
        in_specs.append(tile_spec)
        args.append(data_lo3)
    if weighted:
        in_specs.append(tile_spec)
        args.append(weights3)
    cumulative = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, e_pad), _const_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, e_pad), acc_dtype),
        interpret=interpret,
    )(*args)
    lt = cumulative[0]
    return lt[1:nbins + 1] - lt[:nbins]


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
    ``len(edges) - 1`` (cast at the call site).
    """
    import jax.numpy as jnp

    data = jnp.ravel(data)
    exact64 = np.dtype(data.dtype).itemsize > 4 or np.dtype(edges.dtype).itemsize > 4
    n = data.size
    nbins = int(edges.shape[0]) - 1
    tile = _ROWS * _LANE
    n_pad = max(_round_up(n, tile), tile)
    e_pad = _round_up(nbins + 1, _LANE)

    if exact64:
        d64 = data.astype(jnp.float64)
        dh, dl = _two_float_split(d64)
        # NaN padding self-excludes (NaN < e is False for every edge)
        flat_h = jnp.full((n_pad,), jnp.nan, dtype=jnp.float32).at[:n].set(dh)
        flat_l = jnp.full((n_pad,), jnp.nan, dtype=jnp.float32).at[:n].set(dl)
        data3 = flat_h.reshape(-1, _ROWS, _LANE)
        data_lo3 = flat_l.reshape(-1, _ROWS, _LANE)

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
        edges_row = jnp.full((1, e_pad), jnp.float32(jnp.inf)).at[0, :nbins + 1].set(eh)
        edges_lo_row = jnp.full((1, e_pad), jnp.float32(jnp.inf)).at[0, :nbins + 1].set(el)
    else:
        flat = jnp.full((n_pad,), jnp.nan, dtype=jnp.float32)
        flat = flat.at[:n].set(data.astype(jnp.float32))
        data3 = flat.reshape(-1, _ROWS, _LANE)
        data_lo3 = data3  # ignored

        e = jnp.asarray(edges, dtype=jnp.float32)
        # last edge -> nextafter so `<` realizes numpy's inclusive last bin
        e_last = jnp.nextafter(e[nbins], jnp.float32(jnp.inf))
        edges_row = jnp.full((1, e_pad), jnp.float32(jnp.inf))
        edges_row = edges_row.at[0, :nbins].set(e[:nbins]).at[0, nbins].set(e_last)
        edges_lo_row = edges_row  # ignored

    weighted = weights is not None
    if weighted:
        wflat = jnp.zeros((n_pad,), dtype=jnp.float32)
        wflat = wflat.at[:n].set(jnp.ravel(weights).astype(jnp.float32))
        weights3 = wflat.reshape(-1, _ROWS, _LANE)
    else:
        weights3 = data3  # ignored

    return _histogram_call(
        data3, data_lo3, edges_row, edges_lo_row, weights3,
        nbins, weighted, exact64, interpret,
    )


def use_pallas_histogram(dtype, weights_dtype=None):
    """Routing policy (config ``tpu.histogram-kernel``: auto|pallas|xla).

    auto: the kernel engages on TPU for f32-exact inputs (direct compare)
    and for f64 (two-float compare); CPU stays on XLA (interpret-mode
    pallas is for tests only).  f64 WEIGHTS stay on XLA: the kernel
    accumulates weights in f32, which loses precision on large sums.
    """
    import jax

    from dask_array_tpu import config

    mode = config.get("tpu.histogram-kernel", "auto")
    if mode == "xla":
        return False, False
    import jax.numpy as jnp

    def f32_exact(d):
        d = np.dtype(d)
        return d in (np.dtype("f4"), np.dtype("f2")) or d == jnp.bfloat16.dtype

    def supported(d):
        return f32_exact(d) or np.dtype(d) == np.dtype("f8")

    ok_dtype = supported(dtype)
    if weights_dtype is not None and not f32_exact(weights_dtype):
        ok_dtype = False
    on_tpu = jax.default_backend() not in ("cpu",)
    if mode == "pallas":
        # forced: interpret-mode on CPU so tests exercise the kernel
        return True, not on_tpu
    return (ok_dtype and on_tpu), False
