"""Per-block shard_map execution lane (prototype — VERDICT r3 #5).

The default executor answers the chunks-vs-sharding duality with GSPMD:
dense whole-array ops plus ``with_sharding_constraint``, padding UNEVEN
dims at partition time (which can insert pad/all-gather traffic and
recompute padding work).  This lane makes irregular chunk grids
first-class on the mesh instead: blocks along the chunked axis are padded
to the tallest block, stacked on a leading BLOCK axis, and the block axis
is sharded over every mesh axis.  Inside ``jax.shard_map`` each device
owns whole blocks and runs per-block logic:

  * elemwise trees apply per-block (padding computes garbage that is
    never read back),
  * reductions mask padding to the reduction identity, reduce locally,
    and combine with ONE tiny ``psum``/``pmin``/``pmax`` — the compiled
    HLO contains NO all-gather (``tests/test_shardlane.py`` pins this),
  * cumulative scans run the genuine BLELLOCH two-phase schedule across
    devices: a local scan per device, one tiny all-gather of per-device
    totals, then a local carry apply — the cross-device traffic is
    ``ndev * rest`` elements, not the array
    (reference: ``CumReductionBlelloch``,
    ``/root/reference/dask_array/reductions/_cumulative.py:267``).

Engage with config ``tpu.execution-lane = "shard-map"`` (default
``"auto"`` keeps the GSPMD lane).  Scope (a prototype, declines
otherwise): leaves are ``from_array`` host buffers sharing one chunk
grid, chunked along any ONE axis ``d`` (IRREGULAR block heights welcome —
that is the point), combined by elemwise trees, optionally terminated by
one typed reduction (sum/prod/min/max/mean over all axes, over ``d``, or
block-locally over unsharded axes), one cumsum/cumprod (two-phase
Blelloch along ``d``; collective-free block-local scans along unsharded
axes), or — for row grids (``d == 0``) — one MATMUL against a
single-block right-hand side (``ij,jk->ik`` / ``ij,j->i``): the rhs is
replicated (weights-stationary) and every device runs its row blocks'
GEMM on its own MXU — the compiled HLO contains NO collective at all,
where the GSPMD lane must pad the uneven row dim before the dot.
"""

from __future__ import annotations

import functools
import math

import numpy as np

#: engagement counter for tests (incremented on every lane execution)
ENGAGED = {"count": 0}

_REDUCE_IDENT = {
    "sum": 0.0,
    "prod": 1.0,
    "min": np.inf,
    "max": -np.inf,
    "mean": 0.0,
    # nan variants combine cross-device with their own masking (padding ->
    # NaN / 0); listed here so the plan gate admits them
    "nansum": 0.0,
    "nanmean": 0.0,
    "nanmin": np.inf,
    "nanmax": -np.inf,
}

#: kinds the lane can execute at all (nanprod joins only block-locally)
_LANE_KINDS = tuple(_REDUCE_IDENT) + ("nanprod",)


def _reduce_ident(kind, dtype):
    """The identity of ``kind`` IN ``dtype`` (padding fill value): ±inf
    maps to the integer extrema for int dtypes, True/False for bool."""
    dtype = np.dtype(dtype)
    if kind in ("sum", "mean"):
        return np.zeros((), dtype)[()]
    if kind == "prod":
        return np.ones((), dtype)[()]
    if dtype.kind in "iu":
        info = np.iinfo(dtype)
        return info.max if kind == "min" else info.min
    if dtype.kind == "b":
        return kind == "min"
    return np.inf if kind == "min" else -np.inf


def _unwrap(expr):
    while type(expr).__name__ == "FusedBlockwise":
        expr = expr.root
    return expr


def _walk_elem(node, leaves, seen):
    """Walk an elemwise tree down to FromArray leaves; False = decline."""
    from dask_array_tpu._expr import ArrayExpr
    from dask_array_tpu.ops._from_array import FromArray

    node = _unwrap(node)
    if isinstance(node, FromArray):
        if node._name not in seen:
            seen.add(node._name)
            leaves.append(node)
        return True
    if type(node).__name__ != "Elemwise":
        return False
    for a in node.args:
        if isinstance(a, ArrayExpr) and not _walk_elem(a, leaves, seen):
            return False
    return True


def _leaf_grid_ok(leaves):
    """Shared, known, single-chunked-axis, unmasked leaf grid — or
    ``None``.  Returns ``(grid, d)`` with ``d`` the one chunked axis
    (0 when every axis is a single block)."""
    if not leaves:
        return None
    grid = leaves[0].chunks
    if any(l.chunks != grid for l in leaves):
        return None  # one shared grid only (prototype)
    chunked = [ax for ax, c in enumerate(grid) if len(c) != 1]
    if len(chunked) > 1:
        return None  # chunked along ONE axis only
    d = chunked[0] if chunked else 0
    if any(isinstance(h, float) and math.isnan(h) for c in grid for h in c):
        return None  # known heights required
    if not grid or not grid[d] or sum(grid[d]) == 0:
        return None  # empty arrays: nothing to shard
    if any(isinstance(l.source, np.ma.MaskedArray) for l in leaves):
        return None  # masked stays on the host lane
    return grid, d


def _plan_matmul(root):
    """Einsum terminal: irregular-rows matmul against a single-block rhs.

    Accepts exactly ``ab,bc->ac`` / ``ab,b->a`` shapes (modulo label
    names): lhs an elemwise tree over the shared axis-0-chunked grid
    (single chunk along the contracted axis), rhs an elemwise tree whose
    leaves are single-block everywhere (it will be replicated).
    """
    labels = root.input_labels
    if len(labels) != 2 or len(root.arrays) != 2:
        return None
    l0, l1 = labels
    out = root.out_labels
    if len(l0) != 2 or len(set(l0)) != 2:
        return None
    a, b = l0
    if len(l1) == 2:  # matrix @ matrix: ab,bc->ac with c a fresh label
        if l1[0] != b or l1[1] in (a, b) or out != a + l1[1]:
            return None
    elif l1 == b:  # matrix @ vector: ab,b->a
        if out != a:
            return None
    else:
        return None
    lhs, rhs = root.arrays
    lhs_leaves, rhs_leaves = [], []
    if not _walk_elem(lhs, lhs_leaves, set()):
        return None
    if not _walk_elem(rhs, rhs_leaves, set()):
        return None
    ok = _leaf_grid_ok(lhs_leaves)
    if ok is None or ok[1] != 0:
        return None  # rows sharded; a chunked contraction axis declines
    if not rhs_leaves:
        return None
    rgrid = rhs_leaves[0].chunks
    if any(l.chunks != rgrid for l in rhs_leaves):
        return None
    if any(len(c) != 1 for c in rgrid):
        return None  # rhs must be one block (it is replicated)
    if any(isinstance(h, float) and math.isnan(h) for c in rgrid for h in c):
        return None
    if any(isinstance(l.source, np.ma.MaskedArray) for l in rhs_leaves):
        return None
    return "matmul", root, _unwrap(lhs), lhs_leaves, 0, (_unwrap(rhs), rhs_leaves)


def _plan(root):
    """Validate the subtree and return an execution plan, or None.

    plan = (kind, terminal, elem_root, leaves, d, aux) where kind is
    "elemwise" | "reduce" | "reduce_local" | "cumulative" | "matmul",
    terminal the Reduction/CumReduction/Einsum node (or None), leaves the
    FromArray nodes in deterministic order, d the one chunked (sharded)
    axis, and aux the kind-specific extra ("matmul": the rhs tree + its
    leaves).
    """
    from dask_array_tpu.ops.linalg import Einsum
    from dask_array_tpu.ops.reductions import CumReduction, Reduction

    root = _unwrap(root)
    terminal = None
    kind = "elemwise"
    if isinstance(root, Einsum):
        return _plan_matmul(root)
    if isinstance(root, Reduction):
        if root.keepdims:
            return None
        if root.kind not in _LANE_KINDS:
            return None
        inner = _unwrap(root.array)
        if isinstance(inner, Einsum):
            # reduction OVER the matmul: the GEMM runs per-device and the
            # reduce composes on top (padded rows masked before combining)
            mm = _plan_matmul(inner)
            if mm is None:
                return None
            if root.kind.startswith("nan"):
                return None  # composed GEMM reduces stay plain-kind
            axes = tuple(root.axes)
            nd = root.array.ndim
            if 0 in axes:
                if axes not in (tuple(range(nd)), (0,)):
                    return None
                if root.kind == "prod":
                    return None  # no sign-safe cross-device prod collective
            return "matmul", inner, mm[2], mm[3], 0, mm[5] + (root,)
        terminal, kind = root, "reduce"  # split on d below, once known
        elem_root = _unwrap(root.array)
    elif isinstance(root, CumReduction):
        if root.kind not in ("cumsum", "cumprod"):
            return None
        terminal, kind = root, "cumulative"
        elem_root = _unwrap(root.array)
    else:
        elem_root = root

    # walk the elemwise tree down to FromArray leaves
    leaves = []
    if not _walk_elem(elem_root, leaves, set()):
        return None
    ok = _leaf_grid_ok(leaves)
    if ok is None:
        return None
    grid, d = ok

    if kind == "reduce":
        axes = tuple(terminal.axes)
        nd = terminal.array.ndim
        if d not in axes and axes:
            # unsharded axes reduce block-locally: no collective, padding
            # drops at unpad (prod is fine — no cross-device combine)
            kind = "reduce_local"
        elif axes in (tuple(range(nd)), (d,)):
            if terminal.kind not in _REDUCE_IDENT:
                return None
        else:
            return None
    elif kind == "cumulative" and terminal.axis != d:
        # an unsharded scan axis never crosses a block boundary: pure
        # block-local work, no collective at all
        kind = "cumulative_local"

    return kind, terminal, elem_root, leaves, d, None


def _eval_elem(node, env):
    """Apply the elemwise tree to the per-device stacked blocks."""
    from dask_array_tpu._expr import ArrayExpr

    node = _unwrap(node)
    if node._name in env:
        return env[node._name]
    args = [
        _eval_elem(a, env) if isinstance(a, ArrayExpr) else a
        for a in node.args
    ]
    out = node.func(*args, **node._kwargs_dict)
    env[node._name] = out
    return out


def try_execute_shard(root, mesh):
    """Execute ``root`` through the shard_map lane; None = declined."""
    plan = _plan(root)
    if plan is None:
        return None
    kind, terminal, elem_root, leaves, d, aux = plan

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(mesh.axis_names)
    ndev = int(np.prod(list(mesh.shape.values())))
    grid = leaves[0].chunks
    heights = tuple(int(h) for h in grid[d])
    k = len(heights)
    hmax = max(heights) if heights else 1
    kpad = -(-max(k, 1) // ndev) * ndev  # blocks padded to a device multiple
    nd = len(grid)
    # per-block shape: the chunked axis padded to the tallest block
    block_shape = tuple(
        hmax if ax == d else int(sum(c)) for ax, c in enumerate(grid)
    )
    rest = block_shape[:d] + block_shape[d + 1:]

    # stack each leaf's blocks into (kpad, *block_shape) host buffers
    stacked = []
    for leaf in leaves:
        ((key, src),) = list(leaf._leaf_buffers())
        src = np.asarray(src)
        buf = np.zeros((kpad,) + block_shape, dtype=src.dtype)
        pos = 0
        for i, h in enumerate(heights):
            sel = (i,) + (slice(None),) * d + (slice(0, h),)
            srcsel = (slice(None),) * d + (slice(pos, pos + h),)
            buf[sel] = src[srcsel]
            pos += h
        stacked.append(buf)
    sizes = np.zeros((kpad,), dtype=np.int32)
    sizes[:k] = heights

    sh = NamedSharding(mesh, P(axes))
    dev_args = [jax.device_put(b, sh) for b in stacked]
    dev_sizes = jax.device_put(sizes, sh)

    n_true = sum(heights)
    out_dtype = np.dtype(_unwrap(root).dtype)

    def local(fn_args, fn_sizes):
        env = {}
        for leaf, arr in zip(leaves, fn_args):
            env[leaf._name] = arr
        val = _eval_elem(elem_root, env)
        # padding validity mask: (k_loc, 1..., hmax at stacked axis d, ...1)
        mask = (
            jnp.arange(hmax, dtype=jnp.int32)[None, :]
            < fn_sizes[:, None]
        ).reshape(
            (fn_sizes.shape[0],) + (1,) * d + (hmax,) + (1,) * (nd - d - 1)
        )
        return val, mask

    if kind == "matmul":
        # weights-stationary GEMM: rhs (one block, possibly an elemwise
        # tree) is replicated; each device contracts its own row blocks
        # on its MXU.  Padding rows multiply to garbage that _unstack
        # drops; the compiled HLO contains NO collective (pinned by
        # tests/test_shardlane.py) where GSPMD's pad-to-regular lowering
        # of the uneven row dim is not collective-free.
        rhs_root, rhs_leaves = aux[0], aux[1]
        post = aux[2] if len(aux) == 3 else None  # composed terminal Reduction
        rhs_repl = NamedSharding(mesh, P())
        rhs_args = []
        for leaf in rhs_leaves:
            ((_, src),) = list(leaf._leaf_buffers())
            rhs_args.append(jax.device_put(np.asarray(src), rhs_repl))
        rhs_vec = len(terminal.input_labels[1]) == 1
        kwargs = dict(terminal.kwargs or ())
        from dask_array_tpu import config

        precision = kwargs.get("precision") or config.get(
            "tpu.matmul-precision", "highest"
        )
        if post is not None:
            p_axes = tuple(post.axes)
            p_nd = post.array.ndim
            p_full = p_axes == tuple(range(p_nd))
            p_sharded = 0 in p_axes
            p_acc = np.dtype(post.dtype)
            ncols = int(post.array.shape[-1]) if not rhs_vec else 1
            p_count = n_true * (ncols if p_full else 1) if p_sharded else ncols

        def body(fn_sizes, *fn_args):
            lhs_args = fn_args[: len(leaves)]
            val, mask = local(lhs_args, fn_sizes)
            renv = {}
            for leaf, arr in zip(rhs_leaves, fn_args[len(leaves):]):
                renv[leaf._name] = arr
            rhs = _eval_elem(rhs_root, renv)
            spec = "bhj,j->bh" if rhs_vec else "bhj,jk->bhk"
            mm = jnp.einsum(spec, val, rhs, precision=precision)
            if post is None:
                return mm
            op = {"sum": jnp.sum, "mean": jnp.sum, "prod": jnp.prod,
                  "min": jnp.min, "max": jnp.max}[post.kind]
            kw = {"dtype": p_acc} if (
                post.kind in ("sum", "mean", "prod") and p_acc.kind in "fc"
            ) else {}
            if not p_sharded:
                # unsharded axes only: block-local reduce, rows unpad later
                out = op(mm, axis=tuple(ax + 1 for ax in p_axes), **kw)
                if post.kind == "mean":
                    out = out / jnp.asarray(p_count, out.dtype)
                return out
            # the sharded row axis folds in: mask the padded GEMM rows to
            # the identity, reduce locally, combine with one collective
            mask2 = mask.reshape(mask.shape[:2] + (1,) * (mm.ndim - 2))
            ident = jnp.asarray(_reduce_ident(post.kind, mm.dtype), mm.dtype)
            masked = jnp.where(mask2, mm, ident)
            red_axes = None if p_full else (0, 1)
            part = op(masked, axis=red_axes, **kw)
            if post.kind in ("sum", "mean"):
                tot = jax.lax.psum(part, axes)
            elif post.kind == "min":
                tot = jax.lax.pmin(part, axes)
            else:
                tot = jax.lax.pmax(part, axes)
            if post.kind == "mean":
                tot = tot / jnp.asarray(p_count, tot.dtype)
            return tot

        out_sharded = post is None or not p_sharded
        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(axes),) + (P(axes),) * len(dev_args) + (P(),) * len(rhs_args),
                out_specs=P(axes) if out_sharded else P(),
            )
        )
        out = fn(dev_sizes, *dev_args, *rhs_args)
        ENGAGED["count"] += 1
        if out_sharded:
            return _unstack(out, heights, out_dtype)
        return out.astype(out_dtype) if out.dtype != out_dtype else out

    if kind == "reduce_local":
        rkind = terminal.kind
        acc_dtype = np.dtype(terminal.dtype)
        red_axes = tuple(ax + 1 for ax in terminal.axes)  # +1: stacked hmax dim
        count = math.prod(
            int(sum(grid[ax])) for ax in terminal.axes
        )

        def body(fn_sizes, *fn_args):
            val, _ = local(fn_args, fn_sizes)
            op = {"sum": jnp.sum, "mean": jnp.sum, "prod": jnp.prod,
                  "min": jnp.min, "max": jnp.max,
                  "nansum": jnp.nansum, "nanmean": jnp.nanmean,
                  "nanprod": jnp.nanprod,
                  "nanmin": jnp.nanmin, "nanmax": jnp.nanmax}[rkind]
            kw = {}
            if rkind in ("sum", "mean", "prod", "nansum", "nanmean",
                         "nanprod") and acc_dtype.kind in "fc":
                kw["dtype"] = acc_dtype
            out = op(val, axis=red_axes, **kw)
            if rkind == "mean":
                out = out / jnp.asarray(count, out.dtype)
            return out

        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(axes),) + (P(axes),) * len(dev_args),
                out_specs=P(axes),
            )
        )
        stacked_out = fn(dev_sizes, *dev_args)
        ENGAGED["count"] += 1
        # d's position among the surviving (unreduced) axes
        out_d = d - sum(1 for ax in terminal.axes if ax < d)
        return _unstack(stacked_out, heights, out_dtype, out_d)

    if kind == "reduce":
        rkind = terminal.kind
        if rkind == "prod":
            # a cross-device prod all-reduce has no sign-safe collective
            # (psum-of-logs breaks on negatives/zeros); GSPMD lane instead
            return None
        full = len(terminal.axes) == terminal.array.ndim
        acc_dtype = np.dtype(terminal.dtype)
        # count of TRUE elements folded into each output element
        count = n_true * (math.prod(rest) if full else 1)

        def body(fn_sizes, *fn_args):
            val, mask = local(fn_args, fn_sizes)
            # nan kinds on non-float data ARE the plain kinds (numpy: no
            # NaN to skip), so the nan machinery engages on floats only
            nan_kind = rkind.startswith("nan") and np.dtype(val.dtype).kind in "fc"
            base = rkind[3:] if rkind.startswith("nan") else rkind
            red_axes = None if full else (0, d + 1)
            acc_kw = {"dtype": acc_dtype} if acc_dtype.kind in "fc" else {}
            if base in ("sum", "mean"):
                zero = jnp.zeros((), val.dtype)
                if nan_kind:
                    real = mask & ~jnp.isnan(val)
                    part = jnp.sum(jnp.where(real, val, zero), axis=red_axes, **acc_kw)
                else:
                    part = jnp.sum(jnp.where(mask, val, zero), axis=red_axes, **acc_kw)
                tot = jax.lax.psum(part, axes)
                if rkind == "nanmean" and nan_kind:
                    # data-dependent denominator: psum the non-NaN count
                    # (an all-NaN slice divides 0/0 -> NaN, numpy's value)
                    cnt = jax.lax.psum(
                        jnp.sum(real, axis=red_axes, dtype=jnp.int32), axes
                    )
                    tot = tot / cnt.astype(tot.dtype)
                elif rkind in ("mean", "nanmean"):
                    tot = tot / jnp.asarray(count, tot.dtype)
                return tot
            # min/max: mask padding to the dtype identity; for nan kinds a
            # device whose shard is all NaN+padding must not poison the
            # pmin/pmax, so NaN locals swap to the identity and an
            # any-real-value vote restores NaN iff NO device had one
            pop = jax.lax.pmin if base == "min" else jax.lax.pmax
            ident = jnp.asarray(_reduce_ident(base, np.dtype(val.dtype)), val.dtype)
            if nan_kind:
                v = jnp.where(mask & ~jnp.isnan(val), val, ident)
                part = (jnp.min if base == "min" else jnp.max)(v, axis=red_axes)
                has = jnp.any(mask & ~jnp.isnan(val), axis=red_axes)
                tot = pop(part, axes)
                any_has = jax.lax.pmax(has.astype(jnp.int32), axes)
                return jnp.where(any_has > 0, tot, jnp.asarray(jnp.nan, tot.dtype))
            v = jnp.where(mask, val, ident)
            part = (jnp.min if base == "min" else jnp.max)(v, axis=red_axes)
            return pop(part, axes)

        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(axes),) + (P(axes),) * len(dev_args),
                out_specs=P(),
            )
        )
        out = fn(dev_sizes, *dev_args)
        ENGAGED["count"] += 1
        return out.astype(out_dtype) if out.dtype != out_dtype else out

    if kind == "cumulative":
        ckind = terminal.kind
        ident = 0.0 if ckind == "cumsum" else 1.0
        cdtype = np.dtype(terminal.dtype)

        def body(fn_sizes, *fn_args):
            val, mask = local(fn_args, fn_sizes)
            val = jnp.where(mask, val, jnp.asarray(ident, val.dtype)).astype(
                cdtype if cdtype.kind != "M" else val.dtype
            )
            k_loc = val.shape[0]
            # bring the stacked scan axis next to the block axis so local
            # blocks flatten into one contiguous scan (identity when d==0)
            flat = jnp.moveaxis(val, d + 1, 1).reshape((k_loc * hmax,) + rest)
            scan = jnp.cumsum(flat, axis=0) if ckind == "cumsum" else jnp.cumprod(flat, axis=0)
            total = scan[-1]
            # Blelloch phase 2: ONE tiny all-gather of per-device totals,
            # exclusive-scan them, apply the carry locally
            totals = jax.lax.all_gather(total, axes, tiled=False)
            totals = totals.reshape((ndev,) + rest)
            me = jax.lax.axis_index(axes)
            if ckind == "cumsum":
                carry_all = jnp.cumsum(totals, axis=0) - totals  # exclusive
                scan = scan + carry_all[me]
            else:
                # exclusive cumprod (division would be unsafe with zeros)
                ex = jnp.concatenate(
                    [jnp.ones((1,) + rest, totals.dtype),
                     jnp.cumprod(totals[:-1], axis=0)], axis=0
                )
                scan = scan * ex[me]
            return jnp.moveaxis(
                scan.reshape((k_loc, hmax) + rest), 1, d + 1
            )

        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(axes),) + (P(axes),) * len(dev_args),
                out_specs=P(axes),
            )
        )
        stacked_out = fn(dev_sizes, *dev_args)
        ENGAGED["count"] += 1
        return _unstack(stacked_out, heights, out_dtype, d)

    if kind == "cumulative_local":
        # scan axis is unsharded: never crosses a block boundary, so each
        # device scans its own blocks with no collective at all
        ckind = terminal.kind
        scan_ax = terminal.axis + 1
        cdtype = np.dtype(terminal.dtype)

        def body(fn_sizes, *fn_args):
            val, _ = local(fn_args, fn_sizes)
            val = val.astype(cdtype if cdtype.kind != "M" else val.dtype)
            return (
                jnp.cumsum(val, axis=scan_ax)
                if ckind == "cumsum"
                else jnp.cumprod(val, axis=scan_ax)
            )

        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(axes),) + (P(axes),) * len(dev_args),
                out_specs=P(axes),
            )
        )
        stacked_out = fn(dev_sizes, *dev_args)
        ENGAGED["count"] += 1
        return _unstack(stacked_out, heights, out_dtype, d)

    # pure elemwise: compute stacked, reassemble
    def body(fn_sizes, *fn_args):
        val, _ = local(fn_args, fn_sizes)
        return val

    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axes),) + (P(axes),) * len(dev_args),
            out_specs=P(axes),
        )
    )
    stacked_out = fn(dev_sizes, *dev_args)
    ENGAGED["count"] += 1
    return _unstack(stacked_out, heights, out_dtype, d)


def _unstack(stacked, heights, out_dtype, axis=0):
    """(k, *block_shape) stacked blocks -> dense, concatenated along
    ``axis`` (each block trimmed to its true height there)."""
    import jax.numpy as jnp

    pre = (slice(None),) * axis
    parts = [stacked[(i,) + pre + (slice(0, h),)] for i, h in enumerate(heights)]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)
    return out.astype(out_dtype) if out.dtype != out_dtype else out
