"""zarr IO: from_zarr / to_zarr.

Parity: ``/root/reference/dask_array/io/_zarr.py`` (region-aware writes,
chunk-regularity checks, v2/v3) — fresh implementation, gated on the
optional zarr dependency.  zarr is the framework's checkpoint story
(SURVEY.md §5 "Checkpoint / resume").
"""

from __future__ import annotations

import math
from numbers import Integral

import numpy as np


def _require_zarr():
    """The real zarr package when importable, else the vendored lite
    backend (``io/_zarr_lite.py`` — v2/v3 local directory stores), so the
    checkpoint path always RUNS."""
    try:
        import zarr

        return zarr
    except ImportError:
        from dask_array_tpu.io import _zarr_lite

        return _zarr_lite


def from_zarr(url, component=None, storage_options=None, chunks=None, name=None, inline_array=False, **kwargs):
    """Read a zarr array lazily (one from_map block per zarr chunk region)."""
    zarr = _require_zarr()
    from dask_array_tpu.io._from_map import from_map
    from dask_array_tpu._chunks import normalize_chunks

    if isinstance(url, zarr.Array):
        z = url
    else:
        z = zarr.open_array(url, mode="r", path=component, storage_options=storage_options, **kwargs)
    chunks = chunks if chunks is not None else z.chunks
    chunks = normalize_chunks(chunks, z.shape, dtype=z.dtype)

    import itertools

    bounds = [np.cumsum((0,) + tuple(c)) for c in chunks]
    grid = [range(len(c)) for c in chunks]
    slices = []
    for idx in itertools.product(*grid):
        slices.append(
            tuple(
                slice(int(bounds[ax][i]), int(bounds[ax][i + 1]))
                for ax, i in enumerate(idx)
            )
        )

    def load(sl):
        return z[sl]

    shape = z.shape
    return from_map(load, slices, chunks=chunks, shape=shape, dtype=z.dtype)


def to_zarr(arr, url, component=None, storage_options=None, overwrite=False, region=None, compute=True, return_stored=False, **kwargs):
    """Write an Array to zarr (regular chunks required, like the reference)."""
    zarr = _require_zarr()
    from dask_array_tpu._collection import Array
    from dask_array_tpu.io._store import store

    if not isinstance(arr, Array):
        raise TypeError("to_zarr expects an Array")
    if any(
        any(isinstance(c, float) and math.isnan(c) for c in axis) for axis in arr.chunks
    ):
        raise ValueError(
            "Attempting to save array with unknown chunk sizes; call "
            "compute_chunk_sizes() first"
        )
    # zarr requires regular chunking (all equal except possibly the last)
    for axis in arr.chunks:
        if len(set(axis[:-1])) > 1 or (len(axis) > 1 and axis[-1] > axis[0]):
            raise ValueError(
                "zarr requires uniform chunk sizes; rechunk first "
                f"(got {arr.chunks})"
            )
    if isinstance(url, zarr.Array):
        z = url
    elif region is not None:
        # region writes target an EXISTING array (the patch's shape is a
        # window of it, not the array's shape)
        z = zarr.open_array(
            url, mode="a", path=component,
            storage_options=storage_options, **kwargs,
        )
    else:
        z = zarr.open_array(
            url,
            mode="w" if overwrite else "a",
            path=component,
            shape=arr.shape,
            dtype=arr.dtype,
            chunks=tuple(c[0] for c in arr.chunks),
            storage_options=storage_options,
            **kwargs,
        )
    return store(arr, z, regions=region, compute=compute, return_stored=return_stored, lock=False)
