"""Device mesh context for SPMD execution.

``use_mesh`` activates a mesh for every subsequent ``compute()``: leaf
buffers are device_put with chunk-aligned shardings, sharding constraints
are applied at layout boundaries (rechunk/shuffle), and XLA partitions the
traced program with ICI collectives (all_to_all for rechunk, psum trees for
reductions, ppermute for halos).
"""

from __future__ import annotations

import contextlib
import threading

_state = threading.local()


def _stack():
    if not hasattr(_state, "stack"):
        _state.stack = []
    return _state.stack


def current_mesh():
    """The active mesh, or None (single-device execution)."""
    st = _stack()
    return st[-1] if st else None


@contextlib.contextmanager
def use_mesh(mesh):
    """Activate a ``jax.sharding.Mesh`` for computations in this context."""
    _stack().append(mesh)
    try:
        yield mesh
    finally:
        _stack().pop()


def set_mesh(mesh):
    """Imperatively set (or clear, with None) the process-default mesh."""
    st = _stack()
    st.clear()
    if mesh is not None:
        st.append(mesh)


def auto_mesh(n_devices=None, axis_names=("x", "y"), devices=None):
    """Build a near-square 2-D mesh over the available devices."""
    import numpy as np
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    # factor n as close to square as possible
    a = int(np.sqrt(n))
    while n % a:
        a -= 1
    b = n // a
    dev_array = np.asarray(devices).reshape(a, b)
    return Mesh(dev_array, axis_names[: dev_array.ndim])
