"""Lazy reads from HDF5 datasets (complement of to_hdf5).

The reference reads HDF5 through ``from_array(h5py.Dataset)``; that path
works here too (h5py datasets are array-likes), but the dataset handle then
lives inside the leaf.  ``from_hdf5`` opens lazily per block instead, so the
expression is picklable and file handles are scoped to compute time.
"""

from __future__ import annotations

import numpy as np


def from_hdf5(filename, datapath, chunks=None):
    import h5py

    from dask_array_tpu._chunks import normalize_chunks
    from dask_array_tpu.io._from_map import from_map

    with h5py.File(filename, "r") as f:
        dset = f[datapath]
        shape = dset.shape
        dtype = dset.dtype
        native = dset.chunks
    if chunks is None:
        chunks = native if native else "auto"
    chunks = normalize_chunks(chunks, shape, dtype=dtype)

    import itertools

    bounds = [np.cumsum((0,) + tuple(c)) for c in chunks]
    slices = [
        tuple(slice(int(bounds[ax][i]), int(bounds[ax][i + 1])) for ax, i in enumerate(idx))
        for idx in itertools.product(*[range(len(c)) for c in chunks])
    ]

    def load(sl):
        with h5py.File(filename, "r") as f:
            return f[datapath][sl]

    return from_map(load, slices, chunks=chunks, shape=shape, dtype=dtype)
