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
    static_argnames=("nbins", "weighted", "interpret"),
)
def _histogram_call(data3, edges_row, weights3, nbins, weighted, interpret):
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

    def kernel(edges_ref, data_ref, *rest):
        if weighted:
            w_ref, out_ref = rest
        else:
            (out_ref,) = rest

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for c in range(n_chunks):  # static: few 128-edge chunks
            e = edges_ref[:, c * _LANE:(c + 1) * _LANE]  # (1, 128)

            def body(s, acc):
                # unrolled via a STATIC python loop would bloat the kernel;
                # the fori index must stay i32 end to end (x64 would promote
                # a bare literal to i64 and trip Mosaic's index arithmetic)
                off = s * jnp.int32(_SUB)
                d = data_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)
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

    in_specs = [
        pl.BlockSpec((1, e_pad), _const_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rows, lane), _tile_map, memory_space=pltpu.VMEM),
    ]
    args = [edges_row, data3]
    if weighted:
        in_specs.append(
            pl.BlockSpec((1, rows, lane), _tile_map, memory_space=pltpu.VMEM)
        )
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


def histogram(data, edges, weights=None, *, interpret=False):
    """Histogram counts of ``data`` over ``edges`` (numpy semantics:
    half-open bins, last bin closed, NaN/out-of-range excluded).

    ``data`` any shape (flattened); float32-path compute.  Returns float32
    counts of length ``len(edges) - 1`` (cast at the call site).
    """
    import jax.numpy as jnp

    data = jnp.ravel(data)
    n = data.size
    nbins = int(edges.shape[0]) - 1
    tile = _ROWS * _LANE
    n_pad = max(_round_up(n, tile), tile)
    # NaN padding self-excludes (NaN < e is False for every edge)
    flat = jnp.full((n_pad,), jnp.nan, dtype=jnp.float32)
    flat = flat.at[:n].set(data.astype(jnp.float32))
    data3 = flat.reshape(-1, _ROWS, _LANE)

    e = jnp.asarray(edges, dtype=jnp.float32)
    # last edge -> nextafter so `<` realizes numpy's inclusive last bin
    e_last = jnp.nextafter(e[nbins], jnp.float32(jnp.inf))
    e_pad = _round_up(nbins + 1, _LANE)
    edges_row = jnp.full((1, e_pad), jnp.float32(jnp.inf))
    edges_row = edges_row.at[0, :nbins].set(e[:nbins]).at[0, nbins].set(e_last)

    weighted = weights is not None
    if weighted:
        wflat = jnp.zeros((n_pad,), dtype=jnp.float32)
        wflat = wflat.at[:n].set(jnp.ravel(weights).astype(jnp.float32))
        weights3 = wflat.reshape(-1, _ROWS, _LANE)
    else:
        weights3 = data3  # ignored

    return _histogram_call(data3, edges_row, weights3, nbins, weighted, interpret)


def use_pallas_histogram(dtype, weights_dtype=None):
    """Routing policy (config ``tpu.histogram-kernel``: auto|pallas|xla).

    auto: the kernel engages on TPU for float32-exact-representable inputs;
    CPU/f64 stays on XLA (interpret-mode pallas is for tests only).
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

    ok_dtype = f32_exact(dtype)
    if weights_dtype is not None and not f32_exact(weights_dtype):
        ok_dtype = False
    on_tpu = jax.default_backend() not in ("cpu",)
    if mode == "pallas":
        # forced: interpret-mode on CPU so tests exercise the kernel
        return True, not on_tpu
    return (ok_dtype and on_tpu), False
