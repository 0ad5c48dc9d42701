"""Opt-in xarray integration (parity: /root/reference/dask_array/xarray.py).

Registration never happens as an import side effect — call ``register()``.
"""

from dask_array_tpu._xarray import register  # noqa: F401
