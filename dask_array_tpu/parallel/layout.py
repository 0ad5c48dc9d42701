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


def plan_layout(shape, chunks, mesh):
    """Choose a PartitionSpec assignment: array axis -> mesh axis (or None).

    Greedy: largest mesh axes get the array axes with the most evenly
    divisible size, one mesh axis per array axis.
    """
    mesh_axes = sorted(mesh.shape.items(), key=lambda kv: -kv[1])  # (name, size)
    assignment: list = [None] * len(shape)
    used = set()
    for name, msize in mesh_axes:
        if msize == 1:
            continue
        best = None
        best_score = 0
        for ax, dim in enumerate(shape):
            if assignment[ax] is not None or ax in used:
                continue
            if isinstance(dim, float) and math.isnan(dim):
                continue
            if dim % msize != 0:
                continue
            # prefer sharding axes whose chunk grid also divides evenly
            score = dim
            if chunks is not None and len(chunks) == len(shape):
                nb = len(chunks[ax])
                if _regular(chunks[ax]) and nb % msize == 0:
                    score *= 4
            if score > best_score:
                best, best_score = ax, score
        if best is not None:
            assignment[best] = name
            used.add(best)
    return tuple(assignment)


def sharding_for_chunks(shape, chunks, mesh):
    """NamedSharding for an array with this chunk grid on this mesh."""
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec

    spec = plan_layout(shape, chunks, mesh)
    return NamedSharding(mesh, PartitionSpec(*spec))


def sharding_for(shape, mesh):
    return sharding_for_chunks(shape, None, mesh)


def constrain_to_mesh(dense, chunks, mesh):
    """Apply a chunk-aligned sharding constraint to a traced dense value."""
    import jax

    sh = sharding_for_chunks(dense.shape, chunks, mesh)
    if sh is None:
        return dense
    try:
        return jax.lax.with_sharding_constraint(dense, sh)
    except Exception:
        return dense
