"""Multi-array map_overlap (VERDICT round-1 item 8).

The cases below are the reference's own doc examples
(``/root/reference/dask_array/_overlap.py:1041-1200``), run unmodified.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


def test_doc_example_single_derivative():
    x = np.array([1, 1, 2, 3, 3, 3, 2, 1, 1])
    d = da.from_array(x, chunks=5)

    def derivative(a):
        return a - np.roll(a, 1)

    y = d.map_overlap(derivative, depth=1, boundary=0)
    assert_eq(y, np.array([1, 0, 1, 1, 0, 0, -1, -1, 0]), check_dtype=False)


def test_doc_example_multi_2d_1d_broadcast():
    # func(x 2-D, y 1-D) with block broadcasting
    def func(x, y):
        return x + y

    x = da.arange(8).reshape(2, 4).rechunk((1, 2))
    y = da.arange(4).rechunk(2)
    out = da.map_overlap(func, x, y, depth=1, boundary="reflect")
    expected = np.array([[0, 2, 4, 6], [4, 6, 8, 10]])
    assert_eq(out, expected)


def test_doc_example_multi_align_arrays():
    def func(x, y):
        return x + y

    x = da.arange(8, chunks=4)
    y = da.arange(8, chunks=2)
    out = da.map_overlap(func, x, y, depth=1, boundary="reflect", align_arrays=True)
    # aligned to the finer grid: 4 blocks
    assert out.numblocks == (4,)
    assert_eq(out, np.arange(8) * 2)


def test_multi_array_same_shape(rng):
    def func(a, b):
        return a * 2 + b

    x = rng.standard_normal((24, 24))
    y = rng.standard_normal((24, 24))
    dx = da.from_array(x, chunks=(8, 12))
    dy = da.from_array(y, chunks=(8, 12))
    out = da.map_overlap(func, dx, dy, depth=1, boundary="reflect")
    assert_eq(out, x * 2 + y)


def test_multi_array_per_array_depth(rng):
    # list-form depth: one spec per array
    def func(a, b):
        # a has halo 1, b has halo 1 too along its single axis
        return a + b

    x = rng.standard_normal((4, 8))
    y = rng.standard_normal((8,))
    dx = da.from_array(x, chunks=(2, 4))
    dy = da.from_array(y, chunks=4)
    out = da.map_overlap(
        func, dx, dy, depth=[{0: 1, 1: 1}, {0: 1}], boundary="reflect"
    )
    assert_eq(out, x + y)


def test_depth_zero_escapes_to_map_blocks(rng):
    def func(a, b):
        return a - b

    x = rng.standard_normal((8, 8))
    dx = da.from_array(x, chunks=4)
    dy = da.from_array(x, chunks=4)
    out = da.map_overlap(func, dx, dy, depth=0, boundary="reflect")
    from dask_array_tpu.ops._overlap import Overlap

    assert not list(out.expr.find(Overlap))  # no halo machinery built
    assert_eq(out, np.zeros((8, 8)))


def test_non_callable_first_arg_raises():
    d = da.ones((4,), chunks=2)
    with pytest.raises(TypeError, match="callable"):
        da.map_overlap(d, depth=1)


def test_non_array_vararg_raises():
    d = da.ones((4,), chunks=2)
    with pytest.raises(TypeError, match="must be arrays"):
        da.map_overlap(lambda a, b: a, d, 3, depth=1)


def test_asymmetric_depth_needs_none_boundary():
    d = da.ones((12,), chunks=4)
    with pytest.raises(NotImplementedError, match="Asymmetric"):
        da.map_overlap(lambda a: a, d, depth={0: (2, 0)}, boundary="reflect")


def test_asymmetric_depth_boundary_none(rng):
    x = rng.standard_normal((12,))
    d = da.from_array(x, chunks=4)

    def shift_sum(a):
        return a  # identity; asymmetry exercised through chunks/trim only

    out = da.map_overlap(shift_sum, d, depth={0: (2, 0)}, boundary="none")
    assert_eq(out, x)


def test_non_size_preserving_trim(rng):
    # func doubles the block along axis 0 (declared via chunks=);
    # trim slices relative to ACTUAL block shapes
    x = rng.standard_normal((8, 6))
    d = da.from_array(x, chunks=(4, 6))

    def dup(a):
        return np.concatenate([a, a], axis=0)

    out = da.map_overlap(
        dup, d, depth={0: 1}, boundary="none",
        chunks=((10, 10), (6,)), dtype=x.dtype,
    )
    # each overlapped block (rows 0-4 / 3-7 plus halo) duplicated then
    # trimmed by 1 at internal edges
    first = np.concatenate([x[:5], x[:5]], axis=0)[:-1]
    second = np.concatenate([x[3:], x[3:]], axis=0)[1:]
    assert_eq(out, np.concatenate([first, second], axis=0))


def test_legacy_signature_still_works(rng):
    x = rng.standard_normal((10,))
    d = da.from_array(x, chunks=5)
    out = da.map_overlap(d, lambda a: a * 1.0, depth=1, boundary="reflect")
    assert_eq(out, x)


def test_multi_array_on_mesh(rng):
    import jax
    from jax.sharding import Mesh

    from dask_array_tpu.parallel import use_mesh

    devs = np.asarray(jax.devices("cpu")[:8])
    mesh = Mesh(devs, ("r",))
    x = rng.standard_normal((64, 16))
    y = rng.standard_normal((64, 16))
    dx = da.from_array(x, chunks=(8, 16))
    dy = da.from_array(y, chunks=(8, 16))

    def stencil(a, b):
        import jax.numpy as jnp

        return jnp.roll(a, 1, 0) + b

    out = da.map_overlap(stencil, dx, dy, depth={0: 1}, boundary="reflect")
    with use_mesh(mesh):
        got = np.asarray(out.compute())
    assert got.shape == (64, 16)


@pytest.fixture
def rng():
    return np.random.default_rng(13)
