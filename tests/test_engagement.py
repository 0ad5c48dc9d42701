"""Engagement spy: the fast paths must actually ENGAGE.

The reference's ``bench/_spy.py`` discipline as pytest: flagship pipelines
must run through the compiled trace (not the eager fallback), the
optimizer must fire its rewrite rules (not silently no-op), the native
planning library must be loaded, and the structural executable cache must
hit on re-execution.
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu import config
from dask_array_tpu._diagnostics import trace_rewrites

# these tests assert COMPILED-path engagement; the DA_TPU_MODE=eager lane
# deliberately disables that path
pytestmark = pytest.mark.skipif(
    not config.get("tpu.jit", True), reason="eager lane: compiled path off"
)


@pytest.fixture
def rng():
    return np.random.default_rng(67)


def _spy(monkeypatch):
    import dask_array_tpu._executor as ex

    state = {"trace": 0, "eager": 0, "compiles": 0}
    orig = ex._trace_fn

    def spy(root, keys, mesh, args):
        before = len(ex._fn_cache)
        compiled, ck = orig(root, keys, mesh, args)
        state["trace" if compiled is not None else "eager"] += 1
        state["compiles"] += len(ex._fn_cache) - before
        return compiled, ck

    monkeypatch.setattr(ex, "_trace_fn", spy)
    return state


def test_readme_pipeline_stays_compiled(rng, monkeypatch):
    state = _spy(monkeypatch)
    x = da.ones((100, 100), chunks=(10, 10))
    y = (x + x.T)[:10, :10]
    assert np.allclose(np.asarray(y.compute()), 2.0)
    assert state["trace"] == 1 and state["eager"] == 0


def test_flagship_pipelines_stay_compiled(monkeypatch):
    state = _spy(monkeypatch)
    from dask_array_tpu.models import pipelines as P

    for out in (P.readme_example(n=100, chunk=20), P.stencil2d(n=64, chunk=16)):
        np.asarray(out.compute())
    assert state["eager"] == 0, "a flagship pipeline silently fell back to eager"


def test_optimizer_fires_rules_on_readme(rng):
    x = da.ones((100, 100), chunks=(10, 10))
    y = (x + x.T)[:10, :10]
    with trace_rewrites() as tr:
        y.expr.simplify()
    fired = tr.counter()
    assert fired, "simplify fired no rewrite rules on the README pipeline"
    assert any("_accept_slice" in rule for rule in fired), fired


def test_untraceable_pipeline_falls_back_once_then_memoizes(rng, monkeypatch):
    state = _spy(monkeypatch)

    def host_fn(b):
        return np.asarray(b) * 2  # numpy on tracer -> trace error

    x = rng.standard_normal((12,))
    d = da.from_array(x, chunks=4)
    y = d.map_blocks(host_fn, dtype=x.dtype)
    with pytest.warns(RuntimeWarning, match="not jax-traceable"):
        np.testing.assert_allclose(np.asarray(y.compute()), x * 2)
    # second run of the same structure: straight to eager, no warning
    y2 = da.from_array(x + 1, chunks=4).map_blocks(host_fn, dtype=x.dtype)
    np.testing.assert_allclose(np.asarray(y2.compute()), (x + 1) * 2)


def test_executable_cache_hit_on_new_data(rng, monkeypatch):
    state = _spy(monkeypatch)
    x = rng.standard_normal((24, 24))
    a = (da.from_array(x, chunks=8) * 3).sum(axis=1)
    np.asarray(a.compute())
    compiles_first = state["compiles"]
    b = (da.from_array(x * 5, chunks=8) * 3).sum(axis=1)
    np.asarray(b.compute())
    assert state["compiles"] == compiles_first, "structural cache missed"


def test_native_plankit_engaged():
    from dask_array_tpu import native

    assert native.available(), (
        "the C++ plankit library is not loaded — run "
        "`python -m dask_array_tpu.native` to rebuild"
    )


def test_fusion_engages_on_blockwise_chain(rng):
    from dask_array_tpu._blockwise import FusedBlockwise

    x = rng.standard_normal((20, 20))
    d = da.from_array(x, chunks=5)
    y = ((d + 1) * 2 - 3) / 4
    opt = y.expr.optimize()
    assert any(isinstance(n, FusedBlockwise) for n in opt.walk()), opt.tree_repr()


def test_explain_reports_all_phases(rng, capsys):
    from dask_array_tpu._diagnostics import explain

    x = da.ones((40, 40), chunks=10)
    y = (x + x.T)[:10].sum(axis=0)
    explain(y)
    out = capsys.readouterr().out
    for phase in ("simplify", "lower", "fuse"):
        assert phase in out, out


def test_quantile_hf_methods_stay_compiled(rng, monkeypatch):
    """The Hyndman-Fan quantile path (host-computed index tables gathered
    in-graph) must run through the compiled trace, not the eager fallback."""
    state = _spy(monkeypatch)
    x = rng.standard_normal((40, 30))
    x[rng.uniform(size=x.shape) < 0.2] = np.nan
    d = da.from_array(x, chunks=(10, 30))
    for method in ["weibull", "closest_observation", "nearest"]:
        got = np.asarray(da.nanquantile(d, 0.35, axis=1, method=method).compute())
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            exp = np.nanquantile(x, 0.35, axis=1, method=method)
        assert np.allclose(got, exp, equal_nan=True)
    assert state["trace"] >= 3
    assert state["eager"] == 0


def test_ml_dtypes_stay_compiled(monkeypatch):
    """bfloat16 / float8 arrays must run through the compiled trace.

    ml_dtypes extension scalars report numpy kind 'V' exactly like
    structured record dtypes; the structured host lane must NOT capture
    them (doing so silently demoted the headline bf16 matmul ~1000x to
    per-op eager dispatch)."""
    import jax.numpy as jnp

    state = _spy(monkeypatch)
    a = da.ones((32, 32), chunks=16, dtype=jnp.bfloat16)
    out = np.asarray((a @ a).compute(), dtype=np.float32)
    assert np.allclose(out, 32.0)
    assert state["trace"] == 1 and state["eager"] == 0

    import ml_dtypes

    b = da.full((16,), 1.5, chunks=8, dtype=ml_dtypes.float8_e4m3fn)
    got = np.asarray((b + b).compute(), dtype=np.float32)
    assert np.allclose(got, 3.0)
    assert state["eager"] == 0


def test_host_only_dtype_classification():
    """The single predicate deciding host-lane routing: structured records,
    strings, objects, and raw void are host-only; every ml_dtypes device
    scalar is not."""
    import jax.numpy as jnp
    import ml_dtypes

    from dask_array_tpu._chunks import host_only_dtype

    for dt in (
        jnp.bfloat16,
        ml_dtypes.float8_e4m3fn,
        ml_dtypes.float8_e5m2,
        ml_dtypes.int4,
        np.float32,
        np.int64,
        np.bool_,
        "datetime64[ns]",
    ):
        assert not host_only_dtype(dt), dt
    for dt in (np.dtype([("a", "f4"), ("b", "i8")]), "U8", "S4", object, "V8"):
        assert host_only_dtype(dt), dt


def test_bf16_nodes_traceable():
    """node_traceable must hold for every node of a bf16 pipeline (the
    executor's trace-lane gate — regression test for the ml_dtypes
    kind-'V' misclassification)."""
    import jax.numpy as jnp

    from dask_array_tpu._executor import node_traceable

    a = da.ones((32, 32), chunks=16, dtype=jnp.bfloat16)
    y = ((a @ a) + a.T)[:16]
    expr = y.optimize().expr
    assert all(node_traceable(n) for n in expr.walk())


@pytest.mark.parametrize(
    "build",
    [
        lambda a: a.sum(axis=0),
        lambda a: (a + a.T).mean(),
        lambda a: a.rechunk((8, 32)),
        lambda a: a[5:20, ::2],
        lambda a: da.cumsum(a, axis=1),
        lambda a: da.map_overlap(lambda b: b * 2, a, depth=1, boundary="reflect"),
        lambda a: da.concatenate([a, a], axis=0),
    ],
    ids=["sum", "mean", "rechunk", "slice", "cumsum", "overlap", "concat"],
)
def test_bf16_family_sweep_stays_compiled(monkeypatch, build):
    """Representative op families in bfloat16 all execute on the compiled
    trace (nothing else re-inherits the structured-host-lane
    misclassification)."""
    import jax.numpy as jnp

    state = _spy(monkeypatch)
    a = da.ones((32, 32), chunks=16, dtype=jnp.bfloat16)
    out = build(a)
    np.asarray(out.compute())
    assert state["eager"] == 0
