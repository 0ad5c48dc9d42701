"""Explicit SPMD collectives: shard_map halo exchange, all-to-all reshard,
psum reduction.

The default executor lets GSPMD insert collectives from sharding
constraints.  These explicit implementations exist (a) as the documented
mechanism mapping of SURVEY.md §2.6 (halo -> ppermute, rechunk ->
all_to_all, tree reduce -> psum), (b) for kernels where hand-placed
collectives beat GSPMD's choices (ring schedules), and (c) as the building
blocks for the pallas-level ring collectives in kernels/.
"""

from __future__ import annotations

import functools

import numpy as np


def _shard_map():
    import jax

    # jax>=0.7 exposes shard_map at jax.shard_map; older via jax.experimental
    if hasattr(jax, "shard_map"):
        return jax.shard_map
    from jax.experimental.shard_map import shard_map as sm

    return sm


def halo_exchange(x, mesh, axis_name: str, axis: int, depth: int, wrap: bool = False):
    """Attach ghost cells from ring neighbors along a sharded axis.

    Each shard receives ``depth`` rows from its left and right neighbors via
    ``lax.ppermute`` (the reference's overlap ghost-cell tasks,
    ``/root/reference/dask_array/_overlap.py:70``, as one ICI neighbor
    exchange).  Edge shards get zero halos unless ``wrap`` (periodic).

    Returns an array with shard-local shape grown by 2*depth along ``axis``
    (global shape grows by n_shards * 2 * depth — callers trim per shard).
    """
    import jax
    import jax.numpy as jnp
    from jax.lax import ppermute
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis_name]
    shard_map = _shard_map()

    spec_in = [None] * x.ndim
    spec_in[axis] = axis_name
    spec = P(*spec_in)

    def body(shard):
        lo_edge = jax.lax.slice_in_dim(shard, 0, depth, axis=axis)
        hi_edge = jax.lax.slice_in_dim(
            shard, shard.shape[axis] - depth, shard.shape[axis], axis=axis
        )
        fwd = [(i, (i + 1) % n) for i in range(n if wrap else n - 1)]
        bwd = [(i, (i - 1) % n) for i in range(n) if wrap or i > 0]
        from_left = ppermute(hi_edge, axis_name, fwd)   # my left neighbor's tail
        from_right = ppermute(lo_edge, axis_name, bwd)  # my right neighbor's head
        idx = jax.lax.axis_index(axis_name)
        if not wrap:
            from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
            from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right), from_right)
        return jnp.concatenate([from_left, shard, from_right], axis=axis)

    fn = shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return fn(x)


def alltoall_reshard(x, mesh, axis_name: str, from_axis: int, to_axis: int, spec=None):
    """Move the sharded dimension from ``from_axis`` to ``to_axis``.

    One ``lax.all_to_all`` over ICI — the SPMD form of the reference's
    rechunk task plan for an axis-swap relayout
    (``/root/reference/dask_array/_rechunk.py`` TasksRechunk/P2PRechunk).

    ``spec`` optionally carries the full partition assignment (one mesh-axis
    name or None per array axis) so OTHER mesh axes stay sharded through the
    exchange; only ``axis_name``'s assignment moves.
    """
    from jax.lax import all_to_all
    from jax.sharding import PartitionSpec as P

    shard_map = _shard_map()
    base = list(spec) if spec is not None else [None] * x.ndim
    spec_in = list(base)
    spec_in[from_axis] = axis_name
    if spec_in[to_axis] == axis_name:
        spec_in[to_axis] = None
    spec_out = list(spec_in)
    spec_out[from_axis] = None
    spec_out[to_axis] = axis_name

    def body(shard):
        return all_to_all(shard, axis_name, split_axis=to_axis, concat_axis=from_axis, tiled=True)

    fn = shard_map(body, mesh=mesh, in_specs=(P(*spec_in),), out_specs=P(*spec_out))
    return fn(x)


def mesh_collective_relayout(dense, old_chunks, new_chunks, mesh, method=None):
    """Explicit ICI collective schedule for a rechunk layout boundary.

    Compares the mesh layouts of the OLD and NEW chunk grids
    (``plan_layout``); every mesh axis whose array-axis assignment moves is
    resharded with one explicit ``all_to_all`` stage (other mesh axes stay
    sharded through each stage).  Returns the resharded traced value, or
    ``None`` when no axis moves / the method forbids it — the caller then
    falls back to a bare ``with_sharding_constraint`` and GSPMD's schedule.

    This is the executor-wired form of the reference's rechunk planner
    (``/root/reference/dask_array/_rechunk.py:442,563,1326``): its
    copies-vs-tasks choice becomes constraint-vs-explicit-all-to-all, and
    its multi-stage plan becomes one all_to_all per moving mesh axis.
    """
    import math

    from dask_array_tpu import config
    from dask_array_tpu.parallel.layout import plan_layout

    if method is None:
        method = config.get("array.rechunk.method", "auto")
    if method == "tasks":
        return None
    shape = tuple(sum(c) for c in old_chunks)
    if any(isinstance(s, float) and math.isnan(s) for s in shape):
        return None
    in_spec = list(plan_layout(shape, old_chunks, mesh))
    out_spec = list(plan_layout(shape, new_chunks, mesh))
    moves = []
    for name in mesh.shape:
        a = in_spec.index(name) if name in in_spec else None
        b = out_spec.index(name) if name in out_spec else None
        if a is not None and b is not None and a != b:
            moves.append((name, a, b))
    if not moves:
        return None

    # stage the moves so every destination axis is FREE when its all_to_all
    # runs (a tiled all_to_all into an occupied axis interleaves stripes —
    # not a block layout).  Cyclic move sets (mesh-axis swaps) fall back to
    # the GSPMD constraint, which schedules its own collectives.
    local = [
        s // (mesh.shape[n] if n is not None else 1)
        for s, n in zip(shape, in_spec)
    ]
    cur = list(in_spec)
    ordered = []
    pending = list(moves)
    while pending:
        progress = False
        for mv in list(pending):
            name, a, b = mv
            if cur[b] is not None:
                continue  # destination occupied; try after its occupant moves
            n = mesh.shape[name]
            if local[b] % n != 0:
                return None  # unsplittable at this stage
            ordered.append((name, a, b, list(cur)))
            local[b] //= n
            local[a] *= n
            cur[a] = None
            cur[b] = name
            pending.remove(mv)
            progress = True
        if not progress:
            return None  # cycle (axis swap): GSPMD's schedule handles it
    out = dense
    for name, a, b, spec in ordered:
        out = alltoall_reshard(out, mesh, name, from_axis=a, to_axis=b, spec=spec)
    return out


def psum_reduce(x, mesh, axis_name: str, axis: int):
    """Sum over a sharded axis: local reduce + one psum tree over ICI.

    The SPMD form of the reference's ``PartialReduce`` split_every cascade
    (``/root/reference/dask_array/reductions/_reduction.py:900``).
    """
    import jax.numpy as jnp
    from jax.lax import psum
    from jax.sharding import PartitionSpec as P

    shard_map = _shard_map()
    spec_in = [None] * x.ndim
    spec_in[axis] = axis_name
    out_spec = [s for i, s in enumerate(spec_in) if i != axis]

    def body(shard):
        local = jnp.sum(shard, axis=axis)
        return psum(local, axis_name)

    fn = shard_map(body, mesh=mesh, in_specs=(P(*spec_in),), out_specs=P(*out_spec))
    return fn(x)
