"""__getitem__ routing: basic slicing vs newaxis vs fancy indexing.

Parity: the routing in ``/root/reference/dask_array/_collection.py:603-650``
+ ``slicing/_basic.py`` — fresh implementation.
"""

from __future__ import annotations

from numbers import Integral

import numpy as np

from dask_array_tpu._slicing import Slice, is_basic_index, normalize_index


def getitem_router(x, index):
    from dask_array_tpu._collection import Array, new_collection

    if isinstance(index, str) or (
        isinstance(index, list) and index and all(isinstance(i, str) for i in index)
    ):
        # structured-dtype field access (reference
        # tests/test_collection.py::test_field_access): record arrays live
        # on the HOST lane (jax has no record dtypes) — Field extracts a
        # numeric array per block via numpy
        from dask_array_tpu.ops._structured import field_access

        return field_access(x, index)

    index = normalize_index(index, x.shape)

    # split out newaxes (None)
    if any(i is None for i in index):
        newaxes = [pos for pos, i in enumerate(index) if i is None]
        base_index = tuple(i for i in index if i is not None)
        out = getitem_router(x, base_index) if base_index else x
        from dask_array_tpu.ops.manipulation import expand_dims

        # positions of new axes in the *output* of the base index
        out_pos = []
        seen_new = 0
        kept = 0
        for i in index:
            if i is None:
                out_pos.append(kept + seen_new)
                seen_new += 1
            elif not isinstance(i, Integral):
                kept += 1
        return expand_dims(out, tuple(out_pos))

    if is_basic_index(index):
        if all(i == slice(None) for i in index):
            return new_collection(x.expr)
        return new_collection(Slice(x.expr, index))

    # fancy indexing: int arrays / bool arrays / lists / lazy Arrays
    from dask_array_tpu.ops._fancy_indexing import fancy_getitem

    return fancy_getitem(x, index)
