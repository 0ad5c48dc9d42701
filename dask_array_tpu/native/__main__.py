"""CLI: python -m dask_array_tpu.native [--force] builds libplankit."""

import sys

from dask_array_tpu.native import PLANKIT_GENERATION, available, build

if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(f"plankit generation {PLANKIT_GENERATION}: {'OK ' + path if path else 'build FAILED'}")
    print("available:", available())
