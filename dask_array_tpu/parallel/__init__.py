"""SPMD parallelism: mesh context, chunk-grid -> sharding layout, collectives.

The reference scales by handing task graphs to a dask/Frisky scheduler; this
framework scales by SPMD-partitioning one XLA program over a
``jax.sharding.Mesh`` (see SURVEY.md §2.6 for the mechanism mapping).
"""

from dask_array_tpu.parallel.mesh import (
    auto_mesh,
    current_mesh,
    dcn_axis_names,
    multislice_mesh,
    use_mesh,
)
from dask_array_tpu.parallel.layout import (
    constrain_to_mesh,
    sharding_for,
    sharding_for_chunks,
)

__all__ = [
    "auto_mesh",
    "current_mesh",
    "dcn_axis_names",
    "multislice_mesh",
    "use_mesh",
    "constrain_to_mesh",
    "sharding_for",
    "sharding_for_chunks",
]
