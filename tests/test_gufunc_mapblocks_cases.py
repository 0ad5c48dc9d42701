"""gufunc + map_blocks reference case ports.

Behaviors of the reference's ``test_gufunc.py`` / ``test_map_blocks*.py``:
signature parsing, core/loop dims, multiple outputs, axes/keepdims/
vectorize, allow_rechunk; map_blocks explicit-chunk preservation,
block_info stability, drop/new axis interplay, multi-output.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq


@pytest.fixture
def rng():
    return np.random.default_rng(107)


# -- apply_gufunc ---------------------------------------------------------------


@pytest.mark.parametrize("keepdims", [False, True])
@pytest.mark.parametrize("chunks", [(2, 10), (3, 10), (6, 10)])
def test_apply_gufunc_single_output(rng, keepdims, chunks):
    x = rng.standard_normal((6, 10))
    d = da.from_array(x, chunks=chunks)
    out = da.apply_gufunc(
        lambda v: np.mean(v, axis=-1), "(i)->()", d,
        output_dtypes=["f8"], keepdims=keepdims,
    )
    want = x.mean(axis=-1, keepdims=keepdims)
    assert_eq(out, want)


def test_apply_gufunc_multiple_outputs(rng):
    x = rng.standard_normal((5, 8))
    d = da.from_array(x, chunks=(5, 4))  # core dim chunked -> allow_rechunk

    def mean_std(v):
        return np.mean(v, axis=-1), np.std(v, axis=-1)

    m, s = da.apply_gufunc(
        mean_std, "(i)->(),()", d, output_dtypes=["f8", "f8"], allow_rechunk=True
    )
    assert_eq(m, x.mean(axis=-1), rtol=1e-10)
    assert_eq(s, x.std(axis=-1), rtol=1e-10)


def test_apply_gufunc_core_output_dim(rng):
    x = rng.standard_normal((4, 6))
    d = da.from_array(x, chunks=(2, 6))
    out = da.apply_gufunc(
        lambda v: np.sort(v, axis=-1), "(i)->(i)", d, output_dtypes=["f8"]
    )
    assert_eq(out, np.sort(x, axis=-1))


def test_apply_gufunc_new_output_size(rng):
    x = rng.standard_normal((4, 10))
    d = da.from_array(x, chunks=(2, 10))
    out = da.apply_gufunc(
        lambda v: v[..., :3], "(i)->(j)", d,
        output_dtypes=["f8"], output_sizes={"j": 3},
    )
    assert_eq(out, x[:, :3])


def test_apply_gufunc_two_inputs_contraction(rng):
    a = rng.standard_normal((5, 4))
    b = rng.standard_normal((4,))
    out = da.apply_gufunc(
        lambda x, y: np.einsum("...i,i->...", x, y),
        "(i),(i)->()",
        da.from_array(a, chunks=(5, 4)),
        da.from_array(b, chunks=4),
        output_dtypes=["f8"],
    )
    assert_eq(out, a @ b, rtol=1e-10)


def test_apply_gufunc_3d_loop(rng):
    x = rng.standard_normal((3, 4, 6))
    d = da.from_array(x, chunks=(1, 2, 6))
    out = da.apply_gufunc(
        lambda v: np.sum(v, axis=-1), "(i)->()", d, output_dtypes=["f8"]
    )
    assert_eq(out, x.sum(axis=-1), rtol=1e-10)


def test_apply_gufunc_vectorize(rng):
    x = rng.standard_normal((6,))
    d = da.from_array(x, chunks=3)
    out = da.apply_gufunc(
        lambda v: v * 2 + 1, "()->()", d, output_dtypes=["f8"], vectorize=True
    )
    assert_eq(out, x * 2 + 1)


def test_apply_gufunc_axes(rng):
    x = rng.standard_normal((6, 4))
    d = da.from_array(x, chunks=(3, 4))
    out = da.apply_gufunc(
        lambda v: np.sum(v, axis=-1), "(i)->()", d,
        output_dtypes=["f8"], axes=[(0,), ()], allow_rechunk=True,
    )
    assert_eq(out, x.sum(axis=0), rtol=1e-10)


def test_apply_gufunc_allow_rechunk(rng):
    x = rng.standard_normal((6, 10))
    d = da.from_array(x, chunks=(3, 4))  # core dim chunked
    with pytest.raises(ValueError):
        da.apply_gufunc(lambda v: np.sum(v, -1), "(i)->()", d, output_dtypes=["f8"])
    out = da.apply_gufunc(
        lambda v: np.sum(v, -1), "(i)->()", d,
        output_dtypes=["f8"], allow_rechunk=True,
    )
    assert_eq(out, x.sum(axis=-1), rtol=1e-10)


def test_gufunc_class_and_as_gufunc(rng):
    x = rng.standard_normal((4, 8))
    d = da.from_array(x, chunks=(2, 8))

    g = da.gufunc(
        lambda v: np.max(v, axis=-1), signature="(i)->()", output_dtypes="f8"
    )
    assert_eq(g(d), x.max(axis=-1))

    @da.as_gufunc(signature="(i)->()", output_dtypes="f8")
    def rowmin(v):
        return np.min(v, axis=-1)

    assert_eq(rowmin(d), x.min(axis=-1))


# -- map_blocks -----------------------------------------------------------------


def test_map_blocks_explicit_chunks_change_sizes(rng):
    x = rng.standard_normal((8, 6))
    d = da.from_array(x, chunks=(4, 6))
    out = d.map_blocks(
        lambda b: b[:2], chunks=((2, 2), (6,)), dtype=x.dtype
    )
    assert_eq(out, np.concatenate([x[:2], x[4:6]], axis=0))


def test_map_blocks_without_explicit_chunks_preserves(rng):
    x = rng.standard_normal((9, 4))
    d = da.from_array(x, chunks=(3, 2))
    out = d.map_blocks(lambda b: b * 2, dtype=x.dtype)
    assert out.chunks == d.chunks
    assert_eq(out, x * 2)


def test_map_blocks_invalid_chunk_count_raises(rng):
    d = da.from_array(rng.standard_normal((8,)), chunks=4)
    with pytest.raises(ValueError, match="block count"):
        d.map_blocks(lambda b: b, chunks=((4, 4, 4),), dtype="f8")


def test_map_blocks_block_id(rng):
    x = rng.standard_normal((6, 4))
    d = da.from_array(x, chunks=(3, 2))

    def tag(b, block_id=None):
        return b * 0 + block_id[0] * 10 + block_id[1]

    got = np.asarray(d.map_blocks(tag, dtype="f8").compute())
    want = np.block([[np.full((3, 2), 0.0), np.full((3, 2), 1.0)],
                     [np.full((3, 2), 10.0), np.full((3, 2), 11.0)]])
    np.testing.assert_allclose(got, want)


def test_map_blocks_block_info_locations(rng):
    x = rng.standard_normal((8,))
    d = da.from_array(x, chunks=3)
    infos = []

    def probe(b, block_info=None):
        infos.append(block_info[0]["array-location"])
        return b

    np.asarray(d.map_blocks(probe, dtype=x.dtype).compute())
    assert sorted(tuple(loc[0]) for loc in infos) == [(0, 3), (3, 6), (6, 8)]


def test_map_blocks_drop_and_new_axis(rng):
    x = rng.standard_normal((6, 4))
    d = da.from_array(x, chunks=(3, 4))
    dropped = d.map_blocks(lambda b: b[:, 0], drop_axis=1, dtype=x.dtype)
    assert_eq(dropped, x[:, 0])
    added = d.map_blocks(lambda b: b[None], new_axis=0, dtype=x.dtype)
    assert_eq(added, x[None])


def test_map_blocks_multiple_arrays_broadcast(rng):
    x = rng.standard_normal((6, 4))
    v = rng.standard_normal((4,))
    out = da.map_blocks(
        lambda a, b: a + b,
        da.from_array(x, chunks=(3, 2)),
        da.from_array(v, chunks=2),
        dtype="f8",
    )
    assert_eq(out, x + v)


def test_map_blocks_scalar_extra_args(rng):
    x = rng.standard_normal((8,))
    d = da.from_array(x, chunks=4)
    out = d.map_blocks(lambda b, k: b * k, 3.0, dtype="f8")
    assert_eq(out, x * 3.0)


def test_map_blocks_multi_output(rng):
    from dask_array_tpu.ops._map_blocks import map_blocks_multi_output

    x = rng.standard_normal((6,))
    d = da.from_array(x, chunks=3)
    lo, hi = map_blocks_multi_output(
        lambda b: (b - 1, b + 1), d, dtypes=["f8", "f8"]
    )
    assert_eq(lo, x - 1)
    assert_eq(hi, x + 1)


def test_freeze_chunks_blocks_optimizer(rng):
    from dask_array_tpu._rechunk import Rechunk

    x = rng.standard_normal((12,))
    d = da.from_array(x, chunks=4)
    frozen = d.freeze_chunks()
    r = frozen.rechunk(6)
    opt = r.expr.simplify()
    # the rechunk cannot be absorbed through the freeze
    assert any(isinstance(n, Rechunk) for n in opt.walk()), opt.tree_repr()
    assert_eq(r, x)


def test_map_blocks_dtype_inference(rng):
    x = rng.standard_normal((6,)).astype("f4")
    d = da.from_array(x, chunks=3)
    out = d.map_blocks(lambda b: b.astype("f8") * 2)
    assert out.dtype == np.dtype("f8")
    assert_eq(out, x.astype("f8") * 2)
