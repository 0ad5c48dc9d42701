"""IO: from_array conversions, from_map/from_delayed, stores, zarr/hdf5/npy.

Parity: ``/root/reference/dask_array/io/``.
"""

from dask_array_tpu.io._from_map import (
    Delayed,
    delayed,
    from_blocks,
    from_delayed,
    from_map,
)
from dask_array_tpu.io._from_graph import GraphEvaluator, from_graph
from dask_array_tpu.io._hdf5_read import from_hdf5
from dask_array_tpu.io._npy_stack import from_npy_stack, to_npy_stack
from dask_array_tpu.io._store import SerializableLock, store, to_hdf5
from dask_array_tpu.io._tiledb import from_tiledb, to_tiledb
from dask_array_tpu.io._zarr import from_zarr, to_zarr

__all__ = [
    "Delayed",
    "SerializableLock",
    "delayed",
    "from_blocks",
    "from_delayed",
    "from_graph",
    "from_hdf5",
    "from_map",
    "from_npy_stack",
    "from_tiledb",
    "from_zarr",
    "store",
    "to_hdf5",
    "to_npy_stack",
    "to_tiledb",
    "to_zarr",
]
