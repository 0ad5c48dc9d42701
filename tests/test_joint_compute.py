"""``da.compute(*arrays)``: several collections in ONE jitted program.

Reference: work-sharing across collections via the common task graph
(``tests/test_collection.py::test_lowering_shares_work_across_collections_with_shared_ancestry``);
here shared ancestry builds once inside one XLA program
(``_executor.execute_many``).
"""

from __future__ import annotations

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu import _executor


@pytest.fixture
def rng():
    return np.random.default_rng(21)


def test_one_program_for_many_outputs(rng):
    from dask_array_tpu import config

    if not config.get("tpu.jit", True):
        pytest.skip("eager lane compiles no programs")
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    s, m, v = d.sum(axis=0), d.mean(axis=0), d.std(axis=0)
    multi_before = sum(
        1 for k in _executor._fn_cache if isinstance(k, tuple) and k and k[0] == "multi"
    )
    rs, rm, rv = da.compute(s, m, v)
    multi_after = sum(
        1 for k in _executor._fn_cache if isinstance(k, tuple) and k and k[0] == "multi"
    )
    # ONE joint program was compiled and cached (absolute cache size can't
    # be asserted: the LRU may be at its limit during a full-suite run)
    assert multi_after == multi_before + 1
    np.testing.assert_allclose(rs, x.sum(axis=0), rtol=1e-8)
    np.testing.assert_allclose(rm, x.mean(axis=0), rtol=1e-8)
    np.testing.assert_allclose(rv, x.std(axis=0), rtol=1e-8)
    # recompute hits the same executable
    rs2, _, _ = da.compute(s, m, v)
    assert (
        sum(1 for k in _executor._fn_cache if isinstance(k, tuple) and k and k[0] == "multi")
        == multi_after
    )
    np.testing.assert_allclose(rs2, rs)


def test_joint_compute_passthrough(rng):
    d = da.from_array(rng.standard_normal(4), chunks=2)
    a, b, c = da.compute(d.sum(), 42, "hello")
    assert b == 42 and c == "hello"
    np.testing.assert_allclose(a, np.asarray(d.compute()).sum(), rtol=1e-8)


def test_joint_compute_leaf_sharing_patterns(rng):
    # f(A,A) and f(A,B) must not alias in the executable cache
    x = rng.standard_normal((6, 8))
    y = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    d2 = da.from_array(y, chunks=(3, 4))
    (r1,) = da.compute(d + d)[:1]
    r2, _ = da.compute(d + d2, d * 2)
    np.testing.assert_allclose(r1, x + x)
    np.testing.assert_allclose(r2, x + y)


def test_joint_compute_datetime_and_scalar(rng):
    t = np.array(["2010-01-01", "2011-06-01"], dtype="M8[D]")
    dt = da.from_array(t, chunks=1)
    d = da.from_array(rng.standard_normal((4, 4)), chunks=2)
    mx, total = da.compute(dt.max(), d.sum())
    assert mx == t.max() and mx.dtype == t.dtype
    np.testing.assert_allclose(total, np.asarray(d.compute()).sum(), rtol=1e-8)


def test_joint_compute_unknown_chunks_eager(rng):
    x = rng.standard_normal((6, 8))
    d = da.from_array(x, chunks=(3, 4))
    mask = d[d[:, 0] > 0]
    r_mask, r_sum = da.compute(mask.sum(), d.sum())
    np.testing.assert_allclose(r_mask, x[x[:, 0] > 0].sum(), rtol=1e-8)
    np.testing.assert_allclose(r_sum, x.sum(), rtol=1e-8)


def test_joint_compute_on_mesh(rng):
    jax = pytest.importorskip("jax")
    if len(jax.devices()) < 4:
        pytest.skip("needs a multi-device mesh")
    from dask_array_tpu.parallel import use_mesh
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    x = rng.standard_normal((8, 8)).astype("f4")
    d = da.from_array(x, chunks=4)
    with use_mesh(mesh):
        s, m = da.compute(d.sum(axis=0), (d * 2).mean(axis=1))
    np.testing.assert_allclose(np.asarray(s), x.sum(axis=0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m), (x * 2).mean(axis=1), rtol=1e-5)
