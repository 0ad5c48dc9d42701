"""Mesh execution battery (VERDICT round-1 weak item 3).

Per-family pytest coverage of multi-device execution on the virtual CPU
mesh: map_overlap, shuffle, TSQR, blocked matmul, multi-stage pipelines,
output shardings, explicit collectives as executor paths, and the
trace-path engagement spy (the reference's ``bench/_spy.py`` role: assert
the fast path actually engaged, not a silent fallback).
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu._test_utils import assert_eq
from dask_array_tpu.parallel import use_mesh


@pytest.fixture
def rng():
    return np.random.default_rng(61)


@pytest.fixture
def ring8():
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices("cpu")[:8]), ("r",))


@pytest.fixture
def mesh2x4():
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices("cpu")[:8]).reshape(2, 4), ("x", "y"))


def _spy_trace_engaged(monkeypatch):
    """Record whether the compiled-trace path ran (vs eager fallback)."""
    import dask_array_tpu._executor as ex

    state = {"trace": 0, "eager": 0}
    orig = ex._trace_fn

    def spy(root, keys, mesh, args):
        compiled, ck = orig(root, keys, mesh, args)
        state["trace" if compiled is not None else "eager"] += 1
        return compiled, ck

    monkeypatch.setattr(ex, "_trace_fn", spy)
    return state


def test_elemwise_reduction_on_mesh(ring8, rng, monkeypatch):
    from dask_array_tpu import config

    if not config.get("tpu.jit", True):
        pytest.skip("eager lane: compiled path off")
    spy = _spy_trace_engaged(monkeypatch)
    x = rng.standard_normal((64, 32))
    d = da.from_array(x, chunks=(8, 32))
    out = ((d * 2 + 1) ** 2).sum(axis=0)
    with use_mesh(ring8):
        assert_eq(out, ((x * 2 + 1) ** 2).sum(axis=0))
    assert spy["trace"] >= 1 and spy["eager"] == 0  # compiled path engaged


def test_matmul_on_mesh_2d(mesh2x4, rng):
    x = rng.standard_normal((64, 48))
    y = rng.standard_normal((48, 32))
    dx = da.from_array(x, chunks=(16, 12))
    dy = da.from_array(y, chunks=(12, 8))
    with use_mesh(mesh2x4):
        assert_eq(dx @ dy, x @ y, rtol=1e-10)


def test_matmul_contracted_axis_sharded_emits_allreduce(ring8, rng):
    from dask_array_tpu._diagnostics import compiled_hlo

    x = rng.standard_normal((32, 64))
    y = rng.standard_normal((64, 32))
    dx = da.from_array(x, chunks=(32, 8))  # contraction axis 8-way
    dy = da.from_array(y, chunks=(8, 32))
    out = dx @ dy
    with use_mesh(ring8):
        hlo = compiled_hlo(out)
        assert_eq(out, x @ y, rtol=1e-10)
    assert ("all-reduce" in hlo) or ("reduce-scatter" in hlo), "psum missing"


def test_map_overlap_on_mesh_emits_collective_permute(ring8, rng):
    import jax.numpy as jnp

    from dask_array_tpu._diagnostics import compiled_hlo

    x = rng.standard_normal((64, 16)).astype("f4")
    d = da.from_array(x, chunks=(8, 16))
    st = da.map_overlap(
        lambda b: jnp.roll(b, 1, 0), d, depth={0: 1}, boundary="reflect", dtype="f4"
    )
    with use_mesh(ring8):
        hlo = compiled_hlo(st)
        got = np.asarray(st.compute())
    assert ("collective-permute" in hlo) or ("all-gather" in hlo)
    pad = np.pad(x, ((1, 1), (0, 0)), mode="symmetric")
    np.testing.assert_allclose(got, np.roll(pad, 1, 0)[1:-1], atol=1e-6)


def test_shuffle_on_mesh(ring8, rng):
    x = rng.standard_normal((64, 8))
    d = da.from_array(x, chunks=(8, 8))
    groups = [[5, 1], [0, 2, 63], [40, 41, 42]]
    sh = d.shuffle(groups, axis=0)
    flat = [i for g in groups for i in g]
    with use_mesh(ring8):
        assert_eq(sh, x[flat])


def test_tsqr_on_mesh(ring8, rng):
    x = rng.standard_normal((256, 16))
    d = da.from_array(x, chunks=(32, 16))
    q, r = da.linalg.tsqr(d)
    with use_mesh(ring8):
        qv, rv = np.asarray(q.compute()), np.asarray(r.compute())
    np.testing.assert_allclose(qv @ rv, x, atol=1e-8)
    np.testing.assert_allclose(qv.T @ qv, np.eye(16), atol=1e-8)
    np.testing.assert_allclose(np.tril(rv, -1), 0, atol=1e-10)


def test_tsqr_svd_on_mesh(ring8, rng):
    x = rng.standard_normal((128, 8))
    d = da.from_array(x, chunks=(16, 8))
    u, s, vh = da.linalg.svd(d)
    with use_mesh(ring8):
        uv, sv, vv = (np.asarray(a.compute()) for a in (u, s, vh))
    np.testing.assert_allclose((uv * sv) @ vv, x, atol=1e-7)
    np.testing.assert_allclose(sorted(sv), sorted(np.linalg.svd(x)[1]), atol=1e-7)


def test_multi_stage_pipeline_on_mesh(ring8, rng):
    # rechunk boundary + reduction + elemwise in one program
    x = rng.standard_normal((64, 64))
    d = da.from_array(x, chunks=(8, 64))
    out = (d.cumsum(axis=1).rechunk((64, 8)) * 2).sum(axis=0) + 1
    with use_mesh(ring8):
        assert_eq(out, (np.cumsum(x, axis=1) * 2).sum(axis=0) + 1)


def test_output_sharding_matches_chunk_layout(ring8, rng):
    # the computed device array's sharding follows the chunk-grid layout
    x = rng.standard_normal((64, 16))
    d = da.from_array(x, chunks=(8, 16))
    with use_mesh(ring8):
        dev = (d * 2).compute_device()
    import jax

    assert not dev.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(dev), x * 2)


def test_persist_on_mesh_keeps_sharded_buffers(ring8, rng):
    x = rng.standard_normal((64, 8))
    d = da.from_array(x, chunks=(8, 8))
    with use_mesh(ring8):
        p = (d + 1).persist()
        assert_eq(p * 2, (x + 1) * 2)


def test_random_on_mesh(ring8):
    with use_mesh(ring8):
        r = da.random.default_rng(0).standard_normal((64, 16), chunks=(8, 16))
        v = np.asarray(r.compute())
    assert v.shape == (64, 16)
    assert 0.5 < v.std() < 1.5


def test_gufunc_on_mesh(ring8, rng):
    import jax.numpy as jnp

    x = rng.standard_normal((64, 12))
    d = da.from_array(x, chunks=(8, 12))
    out = da.apply_gufunc(lambda a: jnp.sum(a, axis=-1), "(i)->()", d, output_dtypes=["f8"])
    with use_mesh(ring8):
        assert_eq(out, x.sum(axis=-1))


def test_histogram_on_mesh(ring8, rng):
    x = rng.standard_normal(4096)
    d = da.from_array(x, chunks=512)
    h, edges = da.histogram(d, bins=np.linspace(-3, 3, 33))
    eh, _ = np.histogram(x, bins=np.linspace(-3, 3, 33))
    with use_mesh(ring8):
        assert_eq(h, eh)


def test_blocked_qr_on_mesh_values(ring8, rng):
    x = rng.standard_normal((128, 32))
    d = da.from_array(x, chunks=(16, 16))
    q, r = da.linalg.qr(d)
    with use_mesh(ring8):
        qv, rv = np.asarray(q.compute()), np.asarray(r.compute())
    np.testing.assert_allclose(qv @ rv, x, atol=1e-8)


def test_explicit_psum_reduce_matches(ring8, rng):
    import jax

    from dask_array_tpu.parallel.collectives import psum_reduce

    x = rng.standard_normal((64, 8))
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(ring8, P("r", None)))
    out = psum_reduce(xs, ring8, "r", axis=0)
    np.testing.assert_allclose(np.asarray(out), x.sum(axis=0))


def test_halo_exchange_matches_manual(ring8, rng):
    import jax

    from dask_array_tpu.parallel.collectives import halo_exchange

    x = np.arange(64.0).reshape(64, 1)
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(ring8, P("r", None)))
    out = np.asarray(halo_exchange(xs, ring8, "r", axis=0, depth=1))
    # shard 1 received row 7 from the left and row 16 from the right
    shard1 = out[10:20]
    np.testing.assert_allclose(shard1[0], 7.0)
    np.testing.assert_allclose(shard1[-1], 16.0)


def test_eager_fallback_on_mesh_still_right(ring8, rng):
    # untraceable (structured-array) kernels fall back to eager under a
    # mesh without breaking values
    from functools import partial

    from tests.test_reduction_framework import (
        ref_arg_agg,
        ref_arg_chunk,
        ref_arg_combine,
    )

    x = rng.standard_normal((64,))
    d = da.from_array(x, chunks=8)
    out = da.arg_reduction(
        d,
        partial(ref_arg_chunk, np.max, np.argmax),
        partial(ref_arg_combine, np.argmax),
        partial(ref_arg_agg, np.argmax),
        axis=0,
    )
    with use_mesh(ring8):
        assert_eq(out, np.argmax(x))


def test_sliding_nan_moment_on_mesh(mesh2x4, rng):
    # round-3 fusion: the window dim never materializes, sharded over 2x4
    data = rng.standard_normal((12 * 96, 4))
    data[rng.random(data.shape) < 0.2] = np.nan
    with use_mesh(mesh2x4):
        x = da.from_array(data, chunks=(96, 2))
        v = da.nanvar(da.sliding_window_view(x, 480, axis=0), axis=-1)
        got = np.asarray(v.compute())
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        exp = np.nanvar(np.lib.stride_tricks.sliding_window_view(data, 480, axis=0), axis=-1)
    np.testing.assert_allclose(got, exp, rtol=1e-9, equal_nan=True)


def test_collapsed_loader_stack_on_mesh(ring8):
    # round-3 grouped FromMap collapse executing under a mesh
    from dask_array_tpu.io._from_map import delayed, from_delayed

    def load(i):
        return np.full((8, 8), i, dtype=np.float64)

    parts = [from_delayed(delayed(load)(i), shape=(8, 8), dtype="f8") for i in range(16)]
    with use_mesh(ring8):
        pile = da.stack(parts, axis=0)
        res = np.asarray((pile * 2 + 1).sum(axis=(1, 2)).compute())
    np.testing.assert_array_equal(res, [(i * 2 + 1) * 64 for i in range(16)])
