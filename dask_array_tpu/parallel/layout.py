"""Chunk-grid -> mesh-sharding layout solver.

The dask "chunks" duality on TPU (SURVEY.md §7 "chunks-vs-sharding"):
chunks form an arbitrary logical grid; XLA shardings are regular.  This
module maps a chunk grid onto a mesh by assigning mesh axes to the array
axes whose *sizes* divide evenly, preferring the axes with the most blocks
(so each device owns a whole sub-grid of blocks).  Irregular grids fall
back to replication (correct, not scaled) — per-block dispatch handles
them off-mesh.
"""

from __future__ import annotations

import math


def _regular(chunks_axis) -> bool:
    """True if every block along this axis has the same size."""
    if not chunks_axis:
        return False
    first = chunks_axis[0]
    return all(c == first for c in chunks_axis) and not (
        isinstance(first, float) and math.isnan(first)
    )


def plan_layout(shape, chunks, mesh, allow_uneven=False):
    """Choose a PartitionSpec assignment: array axis -> mesh axis (or None).

    Greedy: largest mesh axes get the array axes with the most evenly
    divisible size, one mesh axis per array axis.  With ``allow_uneven``
    (valid for ``with_sharding_constraint`` targets, where GSPMD pads the
    last shard — NOT for ``device_put``), an irregular axis that merely
    FITS the mesh axis (``dim >= msize``) still shards, at a lower score
    than a divisible one — this is the pad-to-regular answer to the
    chunks-vs-sharding duality (SURVEY.md §7): irregular chunk grids
    compute sharded instead of replicated.
    """
    mesh_axes = sorted(mesh.shape.items(), key=lambda kv: -kv[1])  # (name, size)
    assignment: list = [None] * len(shape)
    for name, msize in mesh_axes:
        if msize == 1:
            continue
        best = None
        best_score = 0
        for ax, dim in enumerate(shape):
            if assignment[ax] is not None:
                continue
            if isinstance(dim, float) and math.isnan(dim):
                continue
            if dim % msize != 0:
                if not (allow_uneven and dim >= msize):
                    continue
                score = dim / 8  # shardable via padding, but prefer divisible
            else:
                score = dim
            # prefer sharding axes whose chunk grid also divides evenly
            if chunks is not None and len(chunks) == len(shape):
                nb = len(chunks[ax])
                if _regular(chunks[ax]) and nb % msize == 0:
                    score *= 4
            if score > best_score:
                best, best_score = ax, score
        if best is not None:
            assignment[best] = name
    return tuple(assignment)


def sharding_for_chunks(shape, chunks, mesh, allow_uneven=False):
    """NamedSharding for an array with this chunk grid on this mesh."""
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec

    spec = plan_layout(shape, chunks, mesh, allow_uneven=allow_uneven)
    return NamedSharding(mesh, PartitionSpec(*spec))


def sharding_for(shape, mesh):
    # device_put target: uneven shardings are NOT allowed here
    return sharding_for_chunks(shape, None, mesh)


def constrain_to_mesh(dense, chunks, mesh):
    """Apply a chunk-aligned sharding constraint to a traced dense value.

    Constraint targets tolerate uneven dims (GSPMD pads), so irregular
    grids still shard here.
    """
    import jax

    sh = sharding_for_chunks(dense.shape, chunks, mesh, allow_uneven=True)
    if sh is None:
        return dense
    try:
        return jax.lax.with_sharding_constraint(dense, sh)
    except Exception:
        return dense
