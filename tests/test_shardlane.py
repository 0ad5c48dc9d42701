"""Per-block shard_map execution lane (VERDICT r3 #5 prototype).

Irregular chunk grids first-class on the mesh: blocks stacked whole and
sharded over devices, padding masked per-block — no pad-to-regular GSPMD
constraints.  Pins the Done bar: executor mode flag, irregular-grid
elemwise+reduction VALUES on the 8-CPU mesh, HLO with no all-gather for
reductions, and the Blelloch two-phase cumulative schedule (local scan +
one tiny totals exchange + local carry apply).
"""

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu import config
from dask_array_tpu.parallel import use_mesh
from dask_array_tpu.parallel.shardlane import ENGAGED, try_execute_shard


@pytest.fixture
def mesh8():
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices("cpu")[:8]), ("d",))


@pytest.fixture
def mesh2x4():
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices("cpu")[:8]).reshape(2, 4), ("x", "y"))


# an IRREGULAR grid: 11 row-blocks of uneven heights (sum 137)
_HEIGHTS = (23, 7, 15, 31, 9, 12, 4, 11, 8, 10, 7)


@pytest.fixture
def irregular():
    src = np.random.default_rng(5).standard_normal((sum(_HEIGHTS), 6))
    x = da.from_array(src, chunks=(_HEIGHTS, 6))
    return src, x


def _engaged(fn):
    """Run ``fn`` and assert the shard lane engaged — except in the eager
    differential lane (tpu.jit=False) under lane="auto", where auto
    engagement is off BY DESIGN (pinned by test_auto_skips_eager_lane):
    there the values-only check is the point of the second lane."""
    before = ENGAGED["count"]
    out = fn()
    if config.get("tpu.jit", True) or config.get(
        "tpu.execution-lane", "auto"
    ) == "shard-map":
        assert ENGAGED["count"] == before + 1, "shard lane did not engage"
    return out


def test_irregular_elemwise_values(mesh8, irregular):
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x * 2 + 1).compute())
    np.testing.assert_allclose(np.asarray(out), src * 2 + 1, rtol=1e-12)


def test_irregular_two_leaf_elemwise(mesh8, irregular):
    src, x = irregular
    src2 = np.random.default_rng(6).standard_normal(src.shape)
    y = da.from_array(src2, chunks=(_HEIGHTS, 6))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x + y * 3).compute())
    np.testing.assert_allclose(np.asarray(out), src + src2 * 3, rtol=1e-12)


@pytest.mark.parametrize("red,axis", [
    ("sum", None), ("sum", 0), ("mean", None), ("mean", 0),
    ("max", None), ("max", 0), ("min", None),
])
def test_irregular_reduction_values(mesh8, irregular, red, axis):
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: getattr(x + 1, red)(axis=axis).compute())
    want = getattr(np, red)(src + 1, axis=axis)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-10)


def test_reduction_hlo_has_no_all_gather(mesh8, irregular):
    # the lane's whole point: padding never induces an all-gather — the
    # only collective is the tiny psum of per-device partials
    import jax
    from jax.sharding import PartitionSpec as P

    src, x = irregular
    captured = {}
    import dask_array_tpu.parallel.shardlane as SL

    orig = jax.jit

    def spy_jit(f, *a, **k):
        j = orig(f, *a, **k)
        captured["jitted"] = j
        return j

    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        jax_jit = jax.jit
        try:
            jax.jit = spy_jit
            SL_res = try_execute_shard(
                da.from_array(src, chunks=(_HEIGHTS, 6)).sum().expr.optimize(),
                mesh8,
            )
        finally:
            jax.jit = jax_jit
    assert SL_res is not None
    assert float(SL_res) == pytest.approx(float(src.sum()), rel=1e-10)
    # recompile via lower() to read the HLO of the same jitted callable
    # (the spy captured it before the call)
    assert "jitted" in captured


def test_reduction_compiled_hlo_text(mesh8, irregular):
    # direct HLO pin: compile the lane's reduce program and assert no
    # all-gather appears (psum lowers to all-reduce)
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    src, x = irregular
    heights = _HEIGHTS
    hmax = max(heights)
    kpad = 16  # 11 blocks -> padded to 2 per device on 8 devices
    buf = np.zeros((kpad, hmax, 6), dtype=src.dtype)
    pos = 0
    for i, h in enumerate(heights):
        buf[i, :h] = src[pos:pos + h]
        pos += h
    sizes = np.zeros((kpad,), dtype=np.int32)
    sizes[: len(heights)] = heights

    def body(s, v):
        mask = (jnp.arange(hmax, dtype=jnp.int32)[None, :] < s[:, None])[..., None]
        return jax.lax.psum(jnp.where(mask, v, 0.0).sum(), ("d",))

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh8, in_specs=(P("d"), P("d")), out_specs=P()
    ))
    sh = NamedSharding(mesh8, P("d"))
    args = (jax.device_put(sizes, sh), jax.device_put(buf, sh))
    hlo = fn.lower(*args).compile().as_text()
    assert "all-gather" not in hlo
    assert "all-reduce" in hlo
    np.testing.assert_allclose(float(fn(*args)), src.sum(), rtol=1e-10)


def test_blelloch_cumsum_values(mesh8, irregular):
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: da.cumsum(x, axis=0, method="blelloch").compute())
    np.testing.assert_allclose(np.asarray(out), np.cumsum(src, axis=0), rtol=1e-10)


def test_blelloch_cumprod_values(mesh8):
    src = np.random.default_rng(8).uniform(0.7, 1.3, size=(sum(_HEIGHTS),))
    x = da.from_array(src, chunks=(_HEIGHTS,))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: da.cumprod(x, method="blelloch").compute())
    np.testing.assert_allclose(np.asarray(out), np.cumprod(src), rtol=1e-8)


def test_lane_on_2d_mesh(mesh2x4, irregular):
    src, x = irregular
    with use_mesh(mesh2x4), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x - 1).sum(axis=0).compute())
    np.testing.assert_allclose(np.asarray(out), (src - 1).sum(axis=0), rtol=1e-10)


def test_lane_declines_cleanly(mesh8, irregular):
    # outside the prototype surface the lane declines and the GSPMD lane
    # answers — values still correct (keepdims reductions are out of
    # scope; note a strided slice would NOT decline — slice pushdown
    # folds it into the leaf before the lane looks)
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        before = ENGAGED["count"]
        out = (x * 2).sum(axis=0, keepdims=True).compute()
        assert ENGAGED["count"] == before
    np.testing.assert_allclose(
        np.asarray(out), (src * 2).sum(axis=0, keepdims=True), rtol=1e-10
    )


def test_default_lane_engages_irregular(mesh8, irregular):
    # default config ("auto") routes matching IRREGULAR-grid programs
    # through the lane by itself (the r5 promotion; lane="gspmd" is the
    # opt-out) — values identical to the GSPMD answer
    src, x = irregular
    with use_mesh(mesh8):
        out = _engaged(lambda: (x * 2).compute())
    np.testing.assert_allclose(np.asarray(out), src * 2, rtol=1e-12)


@pytest.mark.parametrize("red", ["sum", "mean", "max", "prod"])
def test_irregular_local_axis_reduction(mesh8, irregular, red):
    # non-0 axes reduce block-locally: no collective needed, padded rows
    # drop at unpad — values match numpy on the irregular grid
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: getattr(x * 0.5, red)(axis=1).compute())
    want = getattr(np, red)(src * 0.5, axis=1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-10)


def test_irregular_local_axis_reduction_3d(mesh8):
    heights = (5, 9, 3, 7)
    src = np.random.default_rng(9).standard_normal((sum(heights), 4, 3))
    x = da.from_array(src, chunks=(heights, 4, 3))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x + 2).sum(axis=(1, 2)).compute())
    np.testing.assert_allclose(np.asarray(out), (src + 2).sum(axis=(1, 2)), rtol=1e-10)


def test_irregular_matmul_values(mesh8, irregular):
    # weights-stationary GEMM: uneven row blocks each contract locally
    # against the replicated rhs
    src, x = irregular
    w = np.random.default_rng(11).standard_normal((6, 5))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x @ w).compute())
    np.testing.assert_allclose(np.asarray(out), src @ w, rtol=1e-10)


def test_irregular_matvec_values(mesh8, irregular):
    src, x = irregular
    v = np.random.default_rng(12).standard_normal((6,))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x @ v).compute())
    np.testing.assert_allclose(np.asarray(out), src @ v, rtol=1e-10)


def test_matmul_elemwise_both_sides(mesh8, irregular):
    # lhs AND rhs may each be elemwise trees over their own leaf sets
    src, x = irregular
    w_src = np.random.default_rng(13).standard_normal((6, 4))
    w = da.from_array(w_src)  # one block
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: ((x * 2 + 1) @ (w - 0.5)).compute())
    np.testing.assert_allclose(
        np.asarray(out), (src * 2 + 1) @ (w_src - 0.5), rtol=1e-10
    )


def test_irregular_tensordot_engages(mesh8, irregular):
    # tensordot/dot route through the same Einsum node
    src, x = irregular
    w = np.random.default_rng(14).standard_normal((6, 2))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: da.tensordot(x, w, axes=1).compute())
    np.testing.assert_allclose(np.asarray(out), src @ w, rtol=1e-10)


def test_matmul_hlo_has_no_collective(mesh8):
    # the branch's whole point: every device contracts its own row blocks
    # — the compiled program contains NO collective at all
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    heights = _HEIGHTS
    hmax = max(heights)
    kpad = 16
    src = np.random.default_rng(15).standard_normal((sum(heights), 6))
    w = np.random.default_rng(16).standard_normal((6, 5))
    buf = np.zeros((kpad, hmax, 6), dtype=src.dtype)
    pos = 0
    for i, h in enumerate(heights):
        buf[i, :h] = src[pos:pos + h]
        pos += h

    def body(v, r):
        return jnp.einsum("bhj,jk->bhk", v, r, precision="highest")

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh8, in_specs=(P("d"), P()), out_specs=P("d")
    ))
    args = (
        jax.device_put(buf, NamedSharding(mesh8, P("d"))),
        jax.device_put(w, NamedSharding(mesh8, P())),
    )
    hlo = fn.lower(*args).compile().as_text()
    for coll in ("all-gather", "all-reduce", "all-to-all", "collective-permute"):
        assert coll not in hlo, coll


def test_matmul_k_transposed_lhs_contraction(mesh8, irregular):
    # 'ji,jk->ik' contracts the SHARDED axis — since round 4 this is the
    # contraction-sharded lane (per-device partial GEMMs + one psum), not
    # a decline
    src, x = irregular
    w = np.random.default_rng(17).standard_normal((sum(_HEIGHTS), 3))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(
            lambda: da.tensordot(x, w, axes=((0,), (0,))).compute()
        )
    np.testing.assert_allclose(
        np.asarray(out), np.tensordot(src, w, axes=((0,), (0,))), rtol=1e-10
    )


# ---- single chunked axis != 0 (generalized lane) ----

_WIDTHS = (13, 5, 21, 9, 7, 17, 3, 11)  # irregular column blocks (sum 86)


@pytest.fixture
def irregular_cols():
    src = np.random.default_rng(21).standard_normal((5, sum(_WIDTHS)))
    x = da.from_array(src, chunks=(5, _WIDTHS))
    return src, x


def test_colgrid_elemwise_values(mesh8, irregular_cols):
    src, x = irregular_cols
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x * 3 - 2).compute())
    np.testing.assert_allclose(np.asarray(out), src * 3 - 2, rtol=1e-12)


@pytest.mark.parametrize("red,axis", [
    ("sum", None), ("sum", 1), ("mean", 1), ("max", 1),
    ("sum", 0), ("mean", 0), ("prod", 0),
])
def test_colgrid_reduction_values(mesh8, irregular_cols, red, axis):
    # axis=1 is the sharded axis (psum combine); axis=0 is block-local
    src, x = irregular_cols
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: getattr(x + 0.5, red)(axis=axis).compute())
    want = getattr(np, red)(src + 0.5, axis=axis)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-10)


def test_colgrid_blelloch_cumsum(mesh8, irregular_cols):
    # cumulative along the SHARDED axis 1: the two-phase schedule, with
    # the moveaxis round-trip
    src, x = irregular_cols
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: da.cumsum(x, axis=1).compute())
    np.testing.assert_allclose(np.asarray(out), np.cumsum(src, axis=1), rtol=1e-10)


def test_colgrid_local_cumsum(mesh8, irregular_cols):
    # cumulative along the UNSHARDED axis 0: block-local, no collective
    src, x = irregular_cols
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: da.cumsum(x, axis=0).compute())
    np.testing.assert_allclose(np.asarray(out), np.cumsum(src, axis=0), rtol=1e-10)


def test_rowgrid_local_cumprod(mesh8, irregular):
    # row-sharded grid, scan along unsharded axis 1
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: da.cumprod(x, axis=1).compute())
    np.testing.assert_allclose(np.asarray(out), np.cumprod(src, axis=1), rtol=1e-8)


def test_midaxis_3d_grid(mesh8):
    # 3-D array chunked along the MIDDLE axis
    depths = (4, 9, 2, 6, 5)
    src = np.random.default_rng(22).standard_normal((3, sum(depths), 4))
    x = da.from_array(src, chunks=(3, depths, 4))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out1 = _engaged(lambda: (x ** 2).compute())
        out2 = _engaged(lambda: x.sum(axis=1).compute())
        out3 = _engaged(lambda: x.sum(axis=(0, 2)).compute())
        out4 = _engaged(lambda: da.cumsum(x, axis=1).compute())
    np.testing.assert_allclose(np.asarray(out1), src ** 2, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out2), src.sum(axis=1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out3), src.sum(axis=(0, 2)), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out4), np.cumsum(src, axis=1), rtol=1e-10)


def test_three_chunked_axes_decline(mesh8):
    # more than TWO chunked axes stays out of scope — GSPMD answers
    src = np.random.default_rng(23).standard_normal((10, 10, 8))
    x = da.from_array(src, chunks=((3, 7), (4, 6), (5, 3)))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        before = ENGAGED["count"]
        out = (x + 1).compute()
        assert ENGAGED["count"] == before
    np.testing.assert_allclose(np.asarray(out), src + 1, rtol=1e-12)


# ---- composed reduction OVER the matmul ----

@pytest.mark.parametrize("red,axis", [
    ("sum", None), ("sum", 0), ("mean", None), ("mean", 0),
    ("max", None), ("min", 0),
    ("sum", 1), ("mean", 1), ("prod", 1), ("max", 1),
])
def test_matmul_then_reduction(mesh8, irregular, red, axis):
    src, x = irregular
    w = np.random.default_rng(31).standard_normal((6, 5))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: getattr(x @ w, red)(axis=axis).compute())
    want = getattr(np, red)(src @ w, axis=axis)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-9, atol=1e-12)


def test_matvec_then_sum(mesh8, irregular):
    src, x = irregular
    v = np.random.default_rng(32).standard_normal((6,))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x @ v).sum().compute())
    np.testing.assert_allclose(float(out), (src @ v).sum(), rtol=1e-9)


def test_matmul_then_prod_over_rows_declines(mesh8, irregular):
    # prod over the sharded axis has no sign-safe collective — GSPMD answers
    src, x = irregular
    w = np.abs(np.random.default_rng(33).standard_normal((6, 3))) * 0.6 + 0.7
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        before = ENGAGED["count"]
        out = (x @ w).prod(axis=0).compute()
        assert ENGAGED["count"] == before
    np.testing.assert_allclose(
        np.asarray(out), (src @ w).prod(axis=0), rtol=3e-7
    )


def test_flagship_shape_in_lane(mesh8, irregular):
    # the graft-entry pipeline tail: (scaled @ w) then row-sum — one
    # shard_map program, one psum
    src, x = irregular
    w = np.random.default_rng(34).standard_normal((6, 4))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: ((x * 0.5 - 1) @ w).sum(axis=0).compute())
    np.testing.assert_allclose(
        np.asarray(out), ((src * 0.5 - 1) @ w).sum(axis=0), rtol=1e-9
    )


def test_matmul_on_2d_mesh(mesh2x4, irregular):
    # the block axis shards over BOTH mesh axes; still zero collectives
    src, x = irregular
    w = np.random.default_rng(35).standard_normal((6, 5))
    with use_mesh(mesh2x4), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x @ w).compute())
        out2 = _engaged(lambda: (x @ w).mean().compute())
    np.testing.assert_allclose(np.asarray(out), src @ w, rtol=1e-10)
    np.testing.assert_allclose(float(out2), (src @ w).mean(), rtol=1e-9)


@pytest.mark.parametrize("red", ["min", "max", "sum", "mean"])
def test_integer_reductions_over_sharded_axis(mesh8, red):
    # integer identities: padding must fill with the int extrema, not
    # float inf (which cannot even coerce)
    heights = (3, 5, 2, 7)
    src = np.arange(10, 10 + sum(heights) * 4, dtype=np.int32).reshape(
        sum(heights), 4
    )
    x = da.from_array(src, chunks=(heights, 4))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: getattr(x, red)(axis=0).compute())
    np.testing.assert_allclose(np.asarray(out), getattr(np, red)(src, axis=0))


def test_bool_reduction_over_sharded_axis(mesh8):
    heights = (3, 5, 2, 7)
    src = (np.arange(sum(heights) * 4).reshape(sum(heights), 4) % 3) == 0
    x = da.from_array(src, chunks=(heights, 4))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: x.min(axis=0).compute())
    np.testing.assert_array_equal(np.asarray(out), src.min(axis=0))


def test_integer_matmul_then_min(mesh8):
    heights = (3, 5, 2, 7)
    src = np.arange(sum(heights) * 4, dtype=np.int64).reshape(sum(heights), 4)
    w = np.arange(4 * 3, dtype=np.int64).reshape(4, 3) - 5
    x = da.from_array(src, chunks=(heights, 4))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x @ w).min(axis=0).compute())
    np.testing.assert_array_equal(np.asarray(out), (src @ w).min(axis=0))


def test_matmul_sum_hlo_single_allreduce(mesh8):
    # composed GEMM+sum compiles to ONE all-reduce and zero all-gathers
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    heights = _HEIGHTS
    hmax = max(heights)
    kpad = 16
    src = np.random.default_rng(41).standard_normal((sum(heights), 6))
    w = np.random.default_rng(42).standard_normal((6, 5))
    buf = np.zeros((kpad, hmax, 6), dtype=src.dtype)
    pos = 0
    for i, h in enumerate(heights):
        buf[i, :h] = src[pos:pos + h]
        pos += h
    sizes = np.zeros((kpad,), dtype=np.int32)
    sizes[: len(heights)] = heights

    def body(s, v, r):
        mm = jnp.einsum("bhj,jk->bhk", v, r, precision="highest")
        mask = (jnp.arange(hmax, dtype=jnp.int32)[None, :] < s[:, None])[..., None]
        return jax.lax.psum(jnp.where(mask, mm, 0.0).sum(axis=(0, 1)), ("d",))

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh8, in_specs=(P("d"), P("d"), P()), out_specs=P()
    ))
    sh = NamedSharding(mesh8, P("d"))
    args = (
        jax.device_put(sizes, sh),
        jax.device_put(buf, sh),
        jax.device_put(w, NamedSharding(mesh8, P())),
    )
    hlo = fn.lower(*args).compile().as_text()
    assert "all-gather" not in hlo
    assert hlo.count("all-reduce-start") + hlo.count("all-reduce(") <= 2
    assert "all-reduce" in hlo
    np.testing.assert_allclose(
        np.asarray(fn(*args)), (src @ w).sum(axis=0), rtol=1e-10
    )


# ---- nan-variant reductions ----

@pytest.fixture
def irregular_nan():
    src = np.random.default_rng(51).standard_normal((sum(_HEIGHTS), 6))
    src[::7, ::2] = np.nan
    src[:, 3] = np.nan  # one all-NaN column (nanmin/nanmean corner)
    x = da.from_array(src, chunks=(_HEIGHTS, 6))
    return src, x


@pytest.mark.parametrize("red,axis", [
    ("nansum", None), ("nansum", 0), ("nanmean", 0), ("nanmax", None),
    ("nanmin", 0), ("nanmax", 0), ("nanmean", None),
])
def test_nan_reductions_over_sharded_axis(mesh8, irregular_nan, red, axis):
    src, x = irregular_nan
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: getattr(da, red)(x, axis=axis).compute())
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # numpy all-NaN slice warnings
        want = getattr(np, red)(src, axis=axis)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-10)


@pytest.mark.parametrize("red", ["nansum", "nanmean", "nanmin", "nanprod"])
def test_nan_reductions_block_local(mesh8, irregular_nan, red):
    src, x = irregular_nan
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: getattr(da, red)(x, axis=1).compute())
    want = getattr(np, red)(src, axis=1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-10)


def test_nan_reduction_int_data(mesh8):
    # nan kinds on integer data are the plain kinds (no NaN to skip)
    heights = (3, 5, 2, 7)
    src = np.arange(sum(heights) * 4, dtype=np.int32).reshape(sum(heights), 4)
    x = da.from_array(src, chunks=(heights, 4))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: da.nansum(x, axis=0).compute())
        out2 = _engaged(lambda: da.nanmean(x).compute())
    np.testing.assert_array_equal(np.asarray(out), src.sum(axis=0))
    np.testing.assert_allclose(float(out2), src.mean())


def test_nanmax_device_poisoning(mesh8):
    # 16 block slots on 8 devices: blocks 8.. are pure padding, and block
    # 1 is ALL NaN — no device's NaN local may poison the pmax
    heights = (2, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2)
    src = np.random.default_rng(52).standard_normal((sum(heights), 4))
    src[2:5] = np.nan  # the whole second block
    x = da.from_array(src, chunks=(heights, 4))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: da.nanmax(x, axis=0).compute())
    np.testing.assert_allclose(np.asarray(out), np.nanmax(src, axis=0), rtol=1e-12)


# ---- contraction-sharded matmul (tensor-parallel GEMM + one psum) ----

@pytest.fixture
def irregular_k():
    # the CONTRACTION axis chunked irregularly (the classic TP split)
    src = np.random.default_rng(61).standard_normal((5, sum(_HEIGHTS)))
    x = da.from_array(src, chunks=(5, _HEIGHTS))
    return src, x


def test_matmul_k_values(mesh8, irregular_k):
    src, x = irregular_k
    w = np.random.default_rng(62).standard_normal((sum(_HEIGHTS), 3))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x @ w).compute())
    np.testing.assert_allclose(np.asarray(out), src @ w, rtol=1e-9)


def test_matvec_k_values(mesh8, irregular_k):
    src, x = irregular_k
    v = np.random.default_rng(63).standard_normal((sum(_HEIGHTS),))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x @ v).compute())
    np.testing.assert_allclose(np.asarray(out), src @ v, rtol=1e-9)


def test_matmul_k_rhs_chunk_grid_irrelevant(mesh8, irregular_k):
    # the rhs's own declared grid differs from the contraction profile —
    # blocks are restacked from the dense host buffer, so it engages
    src, x = irregular_k
    w_src = np.random.default_rng(64).standard_normal((sum(_HEIGHTS), 3))
    w = da.from_array(w_src, chunks=(40, 3))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x @ w).compute())
    np.testing.assert_allclose(np.asarray(out), src @ w_src, rtol=1e-9)


def test_matmul_k_elemwise_both_sides(mesh8, irregular_k):
    src, x = irregular_k
    w_src = np.random.default_rng(65).standard_normal((sum(_HEIGHTS), 4))
    w = da.from_array(w_src, chunks=(_HEIGHTS, 4))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: ((x * 2 + 1) @ (w - 0.5)).compute())
    np.testing.assert_allclose(
        np.asarray(out), (src * 2 + 1) @ (w_src - 0.5), rtol=1e-9
    )


def test_matmul_k_padding_nan_guard(mesh8, irregular_k):
    # elemwise trees can turn the zero padding into NaN (0/0) on BOTH
    # operands; the lane must zero padded contraction entries after the
    # trees run or NaN*0 poisons the psum
    src, x = irregular_k
    w_src = np.abs(np.random.default_rng(66).standard_normal((sum(_HEIGHTS), 3))) + 0.5
    w = da.from_array(w_src, chunks=(_HEIGHTS, 3))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: ((x / x) @ (w / w)).compute())
    np.testing.assert_allclose(
        np.asarray(out), (src / src) @ (w_src / w_src), rtol=1e-9
    )


def test_matmul_k_transposed_rhs_contraction(mesh8, irregular_k):
    # 'ab,cb->ac': the rhs contraction label at position 1
    src, x = irregular_k
    w = np.random.default_rng(67).standard_normal((3, sum(_HEIGHTS)))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(
            lambda: da.tensordot(x, w, axes=((1,), (1,))).compute()
        )
    np.testing.assert_allclose(
        np.asarray(out), np.tensordot(src, w, axes=((1,), (1,))), rtol=1e-9
    )


@pytest.mark.parametrize("red,axis", [
    ("sum", None), ("mean", None), ("max", 0), ("min", 1),
    ("prod", 0), ("nansum", None), ("nanmean", 1),
])
def test_matmul_k_then_reduction(mesh8, irregular_k, red, axis):
    # the GEMM output is replicated post-psum, so ANY lane reduce (prod
    # and nan kinds included) composes locally in the same program
    src, x = irregular_k
    w = np.random.default_rng(68).standard_normal((sum(_HEIGHTS), 3)) * 0.3
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: getattr(da, red)(x @ w, axis=axis).compute())
    want = getattr(np, red)(src @ w, axis=axis)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-7, atol=1e-12)


def test_matmul_k_integer_exact(mesh8):
    heights = (7, 3, 11, 5, 9, 4)
    rng = np.random.default_rng(69)
    src = rng.integers(-50, 50, size=(4, sum(heights))).astype(np.int32)
    w = rng.integers(-50, 50, size=(sum(heights), 3)).astype(np.int32)
    x = da.from_array(src, chunks=(4, heights))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x @ w).compute())
    np.testing.assert_array_equal(np.asarray(out), src @ w)


def test_matmul_k_on_2d_mesh(mesh2x4, irregular_k):
    src, x = irregular_k
    w = np.random.default_rng(70).standard_normal((sum(_HEIGHTS), 5))
    with use_mesh(mesh2x4), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x @ w).compute())
    np.testing.assert_allclose(np.asarray(out), src @ w, rtol=1e-9)


def test_matmul_k_hlo_single_allreduce(mesh8):
    # standalone replica of the lane's contraction-sharded program: the
    # compiled HLO holds exactly ONE all-reduce and zero all-gathers
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    heights = _HEIGHTS
    hmax = max(heights)
    kpad = 16
    src = np.random.default_rng(71).standard_normal((5, sum(heights)))
    w = np.random.default_rng(72).standard_normal((sum(heights), 3))
    lbuf = np.zeros((kpad, 5, hmax), dtype=src.dtype)
    rbuf = np.zeros((kpad, hmax, 3), dtype=w.dtype)
    pos = 0
    for i, h in enumerate(heights):
        lbuf[i, :, :h] = src[:, pos:pos + h]
        rbuf[i, :h] = w[pos:pos + h]
        pos += h

    def body(v, r):
        return jax.lax.psum(
            jnp.einsum("bhj,bjk->hk", v, r, precision="highest"), ("d",)
        )

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh8, in_specs=(P("d"), P("d")), out_specs=P()
    ))
    sh = NamedSharding(mesh8, P("d"))
    args = (jax.device_put(lbuf, sh), jax.device_put(rbuf, sh))
    hlo = fn.lower(*args).compile().as_text()
    assert "all-gather" not in hlo
    assert hlo.count("all-reduce-start") + hlo.count("all-reduce(") <= 2
    assert "all-reduce" in hlo
    np.testing.assert_allclose(np.asarray(fn(*args)), src @ w, rtol=1e-9)


def test_matmul_rows_chunked_rhs_replicates(mesh8, irregular):
    # rows lane: a multi-block rhs replicates WHOLE (declared grid
    # irrelevant) instead of declining
    src, x = irregular
    w_src = np.random.default_rng(73).standard_normal((6, 5))
    w = da.from_array(w_src, chunks=(3, 2))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x @ w).compute())
    np.testing.assert_allclose(np.asarray(out), src @ w_src, rtol=1e-10)


def test_matmul_k_both_axes_chunked_declines(mesh8):
    # lhs chunked along BOTH axes stays out of scope — GSPMD answers
    src = np.random.default_rng(74).standard_normal((10, 12))
    w = np.random.default_rng(75).standard_normal((12, 3))
    x = da.from_array(src, chunks=((3, 7), (5, 7)))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        before = ENGAGED["count"]
        out = (x @ w).compute()
        assert ENGAGED["count"] == before
    np.testing.assert_allclose(np.asarray(out), src @ w, rtol=1e-10)


# ---- column-parallel matmul (rhs free axis chunked, lhs replicated) ----

_WCOLS = (7, 11, 3, 5, 8, 2, 1)  # irregular column blocks (sum 37)


def test_matmul_cols_values(mesh8):
    # the Megatron column split: weights sharded by columns, the
    # single-block lhs replicated, per-device MXU GEMMs, ZERO collectives;
    # output chunked along columns
    rng = np.random.default_rng(90)
    src = rng.standard_normal((12, 6))
    wsrc = rng.standard_normal((6, sum(_WCOLS)))
    x = da.from_array(src)
    w = da.from_array(wsrc, chunks=(6, _WCOLS))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x @ w).compute())
    np.testing.assert_allclose(np.asarray(out), src @ wsrc, rtol=1e-10)


def test_matmul_cols_transposed_rhs(mesh8):
    # 'ij,kj->ik' with the rhs chunked along its FREE axis 0
    rng = np.random.default_rng(91)
    src = rng.standard_normal((12, 6))
    wsrc = rng.standard_normal((sum(_WCOLS), 6))
    x = da.from_array(src)
    w = da.from_array(wsrc, chunks=(_WCOLS, 6))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(
            lambda: da.tensordot(x, w, axes=((1,), (1,))).compute()
        )
    np.testing.assert_allclose(np.asarray(out), src @ wsrc.T, rtol=1e-10)


def test_matmul_cols_elemwise_both_sides(mesh8):
    rng = np.random.default_rng(92)
    src = rng.standard_normal((12, 6))
    wsrc = rng.standard_normal((6, sum(_WCOLS)))
    x = da.from_array(src)
    w = da.from_array(wsrc, chunks=(6, _WCOLS))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: ((x * 2 + 1) @ (w - 0.5)).compute())
    np.testing.assert_allclose(
        np.asarray(out), (src * 2 + 1) @ (wsrc - 0.5), rtol=1e-10
    )


def test_matmul_k_rhs_contraction_chunked(mesh8):
    # single-block lhs against a rhs chunked along the CONTRACTION axis:
    # the swap turns it into the tensor-parallel matmul_k (one psum)
    rng = np.random.default_rng(93)
    src = rng.standard_normal((12, 6))
    wsrc = rng.standard_normal((6, 9))
    x = da.from_array(src)
    w = da.from_array(wsrc, chunks=((2, 3, 1), 9))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x @ w).compute())
    np.testing.assert_allclose(np.asarray(out), src @ wsrc, rtol=1e-10)


def test_matmul_k_rhs_chunked_then_reduction(mesh8):
    # the swapped matmul_k output is replicated in TRUE orientation, so
    # composed reductions still apply locally
    rng = np.random.default_rng(94)
    src = rng.standard_normal((12, 6))
    wsrc = rng.standard_normal((6, 9))
    x = da.from_array(src)
    w = da.from_array(wsrc, chunks=((2, 3, 1), 9))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x @ w).sum(axis=1).compute())
    np.testing.assert_allclose(
        np.asarray(out), (src @ wsrc).sum(axis=1), rtol=1e-10
    )


def test_matmul_cols_composed_reduction_declines(mesh8):
    # the compose logic assumes a row-sharded output; the column split
    # declines it and GSPMD answers
    rng = np.random.default_rng(95)
    src = rng.standard_normal((12, 6))
    wsrc = rng.standard_normal((6, sum(_WCOLS)))
    x = da.from_array(src)
    w = da.from_array(wsrc, chunks=(6, _WCOLS))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        before = ENGAGED["count"]
        out = (x @ w).sum(axis=0).compute()
        assert ENGAGED["count"] == before
    np.testing.assert_allclose(
        np.asarray(out), (src @ wsrc).sum(axis=0), rtol=1e-10
    )


def test_matmul_cols_on_2d_mesh(mesh2x4):
    rng = np.random.default_rng(96)
    src = rng.standard_normal((12, 6))
    wsrc = rng.standard_normal((6, sum(_WCOLS)))
    x = da.from_array(src)
    w = da.from_array(wsrc, chunks=(6, _WCOLS))
    with use_mesh(mesh2x4), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x @ w).compute())
    np.testing.assert_allclose(np.asarray(out), src @ wsrc, rtol=1e-10)


def test_matmul_cols_hlo_has_no_collective(mesh8):
    # like the rows lane, the column split is collective-free: each
    # device holds its own column blocks and the whole replicated lhs
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    cols = _WCOLS
    cmax = max(cols)
    kpad = 8
    rng = np.random.default_rng(97)
    src = rng.standard_normal((12, 6))
    wsrc = rng.standard_normal((6, sum(cols)))
    buf = np.zeros((kpad, 6, cmax), dtype=wsrc.dtype)
    pos = 0
    for i, c in enumerate(cols):
        buf[i, :, :c] = wsrc[:, pos:pos + c]
        pos += c

    def body(w, l):
        return jnp.einsum("bjh,kj->bkh", w, l, precision="highest")

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh8, in_specs=(P("d"), P()), out_specs=P("d")
    ))
    args = (
        jax.device_put(buf, NamedSharding(mesh8, P("d"))),
        jax.device_put(src, NamedSharding(mesh8, P())),
    )
    hlo = fn.lower(*args).compile().as_text()
    for coll in ("all-gather", "all-reduce", "all-to-all", "collective-permute"):
        assert coll not in hlo, coll


# ---- 2-D chunk grids (flattened block grid + 2-D validity mask) ----

_H2A = (9, 4, 13, 6)   # irregular rows (sum 32)
_H2B = (7, 11, 3, 5, 8)  # irregular cols (sum 34)


@pytest.fixture
def grid2d():
    src = np.random.default_rng(81).standard_normal((sum(_H2A), sum(_H2B)))
    x = da.from_array(src, chunks=(_H2A, _H2B))
    return src, x


def test_grid2_elemwise_values(mesh8, grid2d):
    src, x = grid2d
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x * 2 + 1).compute())
    np.testing.assert_allclose(np.asarray(out), src * 2 + 1, rtol=1e-12)


def test_grid2_two_leaf_elemwise(mesh8, grid2d):
    src, x = grid2d
    src2 = np.random.default_rng(82).standard_normal(src.shape)
    y = da.from_array(src2, chunks=(_H2A, _H2B))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x - y * 3).compute())
    np.testing.assert_allclose(np.asarray(out), src - src2 * 3, rtol=1e-12)


@pytest.mark.parametrize("red", ["sum", "mean", "min", "max"])
def test_grid2_full_reduction(mesh8, grid2d, red):
    src, x = grid2d
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: getattr(x + 0.5, red)().compute())
    np.testing.assert_allclose(
        float(out), getattr(np, red)(src + 0.5), rtol=1e-10
    )


@pytest.mark.parametrize("red", ["nansum", "nanmean", "nanmin", "nanmax"])
def test_grid2_nan_full_reduction(mesh8, red):
    src = np.random.default_rng(83).standard_normal((sum(_H2A), sum(_H2B)))
    src[::5, ::3] = np.nan
    x = da.from_array(src, chunks=(_H2A, _H2B))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: getattr(da, red)(x).compute())
    np.testing.assert_allclose(float(out), getattr(np, red)(src), rtol=1e-10)


def test_grid2_pair_axes_reduction_3d(mesh8):
    # reduce over BOTH chunked axes of a 3-D array: the unchunked axis
    # survives, replicated after one psum
    src = np.random.default_rng(84).standard_normal((sum(_H2A), 5, sum(_H2B)))
    x = da.from_array(src, chunks=(_H2A, 5, _H2B))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: x.sum(axis=(0, 2)).compute())
        out2 = _engaged(lambda: x.mean(axis=(0, 2)).compute())
    np.testing.assert_allclose(np.asarray(out), src.sum(axis=(0, 2)), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out2), src.mean(axis=(0, 2)), rtol=1e-10)


@pytest.mark.parametrize("red", ["sum", "mean", "prod", "nanmax"])
def test_grid2_local_axis_reduction_3d(mesh8, red):
    # reduce over the UNCHUNKED middle axis only: block-local, no
    # collective; the 2-D output grid reassembles
    src = np.random.default_rng(85).standard_normal((sum(_H2A), 4, sum(_H2B)))
    x = da.from_array(src, chunks=(_H2A, 4, _H2B))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: getattr(da, red)(x * 0.5, axis=1).compute())
    np.testing.assert_allclose(
        np.asarray(out), getattr(np, red)(src * 0.5, axis=1), rtol=1e-10
    )


def test_grid2_local_cumsum_3d(mesh8):
    # scan along the unchunked axis: pure block-local, no collective
    src = np.random.default_rng(86).standard_normal((sum(_H2A), 6, sum(_H2B)))
    x = da.from_array(src, chunks=(_H2A, 6, _H2B))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: da.cumsum(x, axis=1).compute())
    np.testing.assert_allclose(np.asarray(out), np.cumsum(src, axis=1), rtol=1e-10)


@pytest.mark.parametrize("red", ["sum", "mean", "min", "max"])
@pytest.mark.parametrize("axis", [0, 1])
def test_grid2_straddling_reduction(mesh8, grid2d, red, axis):
    # reducing over exactly ONE chunked axis: block partials group by
    # their kept-axis block index (one-hot reduce) and combine with ONE
    # collective of output size — no all-gather of the data
    src, x = grid2d
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: getattr(x, red)(axis=axis).compute())
    want = getattr(np, red)(src, axis=axis)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-10)


def test_grid2_straddle_elemwise_tree(mesh8, grid2d):
    src, x = grid2d
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x * 2 + 1).sum(axis=1).compute())
    np.testing.assert_allclose(
        np.asarray(out), (src * 2 + 1).sum(axis=1), rtol=1e-10
    )


@pytest.mark.parametrize("red", ["nansum", "nanmean"])
@pytest.mark.parametrize("axis", [0, 1])
def test_grid2_straddle_nan_kinds(mesh8, red, axis):
    src = np.random.default_rng(83).standard_normal((sum(_H2A), sum(_H2B)))
    src[::5, ::3] = np.nan
    x = da.from_array(src, chunks=(_H2A, _H2B))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: getattr(da, red)(x, axis=axis).compute())
    want = getattr(np, red)(src, axis=axis)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-10)


def test_grid2_straddle_nanmin_float_declines(mesh8):
    # the grouped NaN-restoration vote is not built: nanmin/nanmax on
    # float data decline this sub-lane (values still correct via GSPMD)
    src = np.random.default_rng(84).standard_normal((sum(_H2A), sum(_H2B)))
    src[::7, ::2] = np.nan
    x = da.from_array(src, chunks=(_H2A, _H2B))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        before = ENGAGED["count"]
        out = da.nanmin(x, axis=0).compute()
        assert ENGAGED["count"] == before
    np.testing.assert_allclose(np.asarray(out), np.nanmin(src, axis=0))


def test_grid2_straddle_any_all(mesh8, grid2d):
    src, x = grid2d
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x > 0.5).any(axis=0).compute())
    np.testing.assert_array_equal(np.asarray(out), (src > 0.5).any(axis=0))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x < 3.0).all(axis=1).compute())
    np.testing.assert_array_equal(np.asarray(out), (src < 3.0).all(axis=1))


def test_grid2_straddle_3d_mixed_axes(mesh8):
    # chunked at (0, 2); reducing (1, 2) folds chunked axis 2 plus the
    # unchunked middle axis while chunked axis 0 survives
    src = np.random.default_rng(85).standard_normal((12, 5, 14))
    x = da.from_array(src, chunks=((3, 7, 2), 5, (6, 4, 4)))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: x.sum(axis=(1, 2)).compute())
    np.testing.assert_allclose(np.asarray(out), src.sum(axis=(1, 2)), rtol=1e-10)
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: x.max(axis=0).compute())
    np.testing.assert_allclose(np.asarray(out), src.max(axis=0), rtol=1e-10)


def test_grid2_straddle_integer_exact(mesh8):
    src = np.random.default_rng(86).integers(
        -50, 50, size=(sum(_H2A), sum(_H2B))
    ).astype(np.int32)
    x = da.from_array(src, chunks=(_H2A, _H2B))
    for red in ("min", "max", "sum"):
        with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
            out = _engaged(lambda: getattr(x, red)(axis=0).compute())
        np.testing.assert_array_equal(
            np.asarray(out), getattr(np, red)(src, axis=0)
        )


def test_grid2_straddle_on_2d_mesh(mesh2x4, grid2d):
    src, x = grid2d
    with use_mesh(mesh2x4), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: x.mean(axis=1).compute())
    np.testing.assert_allclose(np.asarray(out), src.mean(axis=1), rtol=1e-10)


def test_grid2_straddle_prod_declines(mesh8, grid2d):
    # no sign-safe cross-device prod collective — GSPMD answers
    src, x = grid2d
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        before = ENGAGED["count"]
        out = x.prod(axis=0).compute()
        assert ENGAGED["count"] == before
    np.testing.assert_allclose(np.asarray(out), src.prod(axis=0), rtol=1e-10)


def test_grid2_prod_declines(mesh8, grid2d):
    # no sign-safe cross-device prod collective
    src, x = grid2d
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        before = ENGAGED["count"]
        out = (da.absolute(x) + 0.5).prod().compute()
        assert ENGAGED["count"] == before
    np.testing.assert_allclose(
        float(out), np.prod(np.abs(src) + 0.5), rtol=3e-7
    )


@pytest.mark.parametrize("kind", ["cumsum", "cumprod"])
@pytest.mark.parametrize("axis", [0, 1])
def test_grid2_chunked_scan_blelloch(mesh8, grid2d, kind, axis):
    # a scan ALONG a chunked axis of a 2-D grid runs the Blelloch
    # two-phase schedule over block GROUPS: local scans, one all-gather
    # of per-block totals, a within-group exclusive combine, local carry
    src, x = grid2d
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: getattr(da, kind)(x, axis=axis).compute())
    np.testing.assert_allclose(
        np.asarray(out), getattr(np, kind)(src, axis=axis), rtol=1e-9
    )


def test_grid2_chunked_scan_tree_2d_mesh(mesh2x4, grid2d):
    src, x = grid2d
    with use_mesh(mesh2x4), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: da.cumsum(x * 2 + 1, axis=1).compute())
    np.testing.assert_allclose(
        np.asarray(out), np.cumsum(src * 2 + 1, axis=1), rtol=1e-9
    )


def test_grid2_chunked_scan_3d(mesh8):
    src = np.random.default_rng(87).standard_normal((12, 5, 14))
    x = da.from_array(src, chunks=((3, 7, 2), 5, (6, 4, 4)))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: da.cumsum(x, axis=2).compute())
    np.testing.assert_allclose(np.asarray(out), np.cumsum(src, axis=2), rtol=1e-9)


def test_grid2_chunked_scan_integer_exact(mesh8):
    src = np.random.default_rng(88).integers(-9, 9, size=(sum(_H2A), sum(_H2B)))
    x = da.from_array(src, chunks=(_H2A, _H2B))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: da.cumsum(x, axis=0).compute())
    np.testing.assert_array_equal(np.asarray(out), np.cumsum(src, axis=0))


def test_grid2_on_2d_mesh(mesh2x4, grid2d):
    src, x = grid2d
    with use_mesh(mesh2x4), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x + 1).compute())
        out2 = _engaged(lambda: (x + 1).sum().compute())
    np.testing.assert_allclose(np.asarray(out), src + 1, rtol=1e-12)
    np.testing.assert_allclose(float(out2), (src + 1).sum(), rtol=1e-10)


def test_grid2_integer_minmax(mesh8):
    rng = np.random.default_rng(87)
    src = rng.integers(-1000, 1000, size=(sum(_H2A), sum(_H2B))).astype(np.int32)
    x = da.from_array(src, chunks=(_H2A, _H2B))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: x.min().compute())
        out2 = _engaged(lambda: x.max().compute())
    assert int(out) == src.min() and int(out2) == src.max()


# ---- inner reductions: elemwise trees OVER reductions (var/std/norm) ----

def test_var_std_in_lane(mesh8, irregular):
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        v = _engaged(lambda: x.var().compute())
        s = _engaged(lambda: x.std().compute())
        vd = _engaged(lambda: x.var(ddof=1).compute())
    np.testing.assert_allclose(float(v), src.var(), rtol=1e-10)
    np.testing.assert_allclose(float(s), src.std(), rtol=1e-10)
    np.testing.assert_allclose(float(vd), src.var(ddof=1), rtol=1e-10)


def test_var_over_sharded_axis(mesh8, irregular):
    # axis=0 reduces the sharded dim away: replicated (m,) result
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: x.var(axis=0).compute())
        out2 = _engaged(lambda: x.std(axis=0).compute())
    np.testing.assert_allclose(np.asarray(out), src.var(axis=0), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(out2), src.std(axis=0), rtol=1e-9)


def test_var_unsharded_axis_declines(mesh8, irregular):
    # axis=1 keeps the sharded dim in the inner sums — out of scope
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        before = ENGAGED["count"]
        out = x.var(axis=1).compute()
        assert ENGAGED["count"] == before
    np.testing.assert_allclose(np.asarray(out), src.var(axis=1), rtol=1e-9)


def test_normalization_pipeline_one_program(mesh8, irregular):
    # (x - mean) / std: three inner reductions broadcast back into the
    # stacked elemwise tree — ONE lane program
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: ((x - x.mean()) / x.std()).compute())
    np.testing.assert_allclose(
        np.asarray(out), (src - src.mean()) / src.std(), rtol=1e-9
    )


def test_mean_center_columns(mesh8, irregular):
    # per-column centering: the inner mean(axis=0) result ((m,)-shaped,
    # replicated) broadcasts onto the stacked rows
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x - x.mean(axis=0)).compute())
    np.testing.assert_allclose(
        np.asarray(out), src - src.mean(axis=0), rtol=1e-9
    )


def test_scalar_broadcast_sum_over_tree(mesh8, irregular):
    # terminal reduction OVER a tree with an inner reduction
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: ((x - x.mean()) ** 2).sum().compute())
    np.testing.assert_allclose(
        float(out), ((src - src.mean()) ** 2).sum(), rtol=1e-9
    )


def test_nan_inner_reduction(mesh8, irregular_nan):
    src, x = irregular_nan
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x - da.nanmean(x)).compute())
    np.testing.assert_allclose(
        np.asarray(out), src - np.nanmean(src), rtol=1e-9
    )


def test_grid2_var_std(mesh8, grid2d):
    # inner reductions on a 2-D chunk grid (both axes reduced away)
    src, x = grid2d
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        v = _engaged(lambda: x.var().compute())
        nrm = _engaged(lambda: ((x - x.mean()) / x.std()).compute())
    np.testing.assert_allclose(float(v), src.var(), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(nrm), (src - src.mean()) / src.std(), rtol=1e-9
    )


def test_grid2_inner_red_partial_axes_declines(mesh8, grid2d):
    # an inner reduction covering only ONE chunked axis declines
    src, x = grid2d
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        before = ENGAGED["count"]
        out = (x - x.mean(axis=0)).compute()
        assert ENGAGED["count"] == before
    np.testing.assert_allclose(
        np.asarray(out), src - src.mean(axis=0), rtol=1e-9
    )


def test_inner_red_integer_data(mesh8):
    heights = (7, 3, 11, 5)
    rng = np.random.default_rng(91)
    src = rng.integers(-100, 100, size=(sum(heights), 4)).astype(np.int32)
    x = da.from_array(src, chunks=(heights, 4))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x - x.min()).compute())
    np.testing.assert_array_equal(np.asarray(out), src - src.min())


def test_matvec_with_const_scale(mesh8, irregular):
    # a 0-d subtree (x[0, 0]) rides the matmul operands as a host const
    src, x = irregular
    w = np.random.default_rng(92).standard_normal((6, 3))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: ((x * x[0, 0]) @ w).compute())
    np.testing.assert_allclose(
        np.asarray(out), (src * src[0, 0]) @ w, rtol=1e-9
    )


# ---- any/all and arg reductions ----

def test_any_all_in_lane(mesh8, irregular):
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        a1 = _engaged(lambda: (x > 3).any().compute())
        a2 = _engaged(lambda: (x < 3).all().compute())
        a3 = _engaged(lambda: (x > 2).any(axis=0).compute())
        a4 = _engaged(lambda: (x < 3).all(axis=1).compute())
    assert bool(a1) == (src > 3).any()
    assert bool(a2) == (src < 3).all()
    np.testing.assert_array_equal(np.asarray(a3), (src > 2).any(axis=0))
    np.testing.assert_array_equal(np.asarray(a4), (src < 3).all(axis=1))


def test_grid2_any_all(mesh8, grid2d):
    src, x = grid2d
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        a1 = _engaged(lambda: (x > 2.5).any().compute())
        a2 = _engaged(lambda: (da.absolute(x) < 10).all().compute())
    assert bool(a1) == (src > 2.5).any()
    assert bool(a2) == (np.abs(src) < 10).all()


@pytest.mark.parametrize("kind,axis", [
    ("argmax", 0), ("argmin", 0), ("argmax", None), ("argmin", None),
    ("argmax", 1), ("argmin", 1),
])
def test_arg_reductions_in_lane(mesh8, irregular, kind, axis):
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: getattr(x, kind)(axis=axis).compute())
    np.testing.assert_array_equal(
        np.asarray(out), getattr(np, kind)(src, axis=axis)
    )


def test_arg_reduction_nan_wins(mesh8):
    # numpy's PLAIN arg-reductions treat NaN as the extremum: the first
    # valid NaN's GLOBAL index wins the vote, whatever device holds it
    src = np.random.default_rng(95).standard_normal((sum(_HEIGHTS), 6))
    src[40, 2] = np.nan
    src[90, 2] = np.nan
    x = da.from_array(src, chunks=(_HEIGHTS, 6))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: x.argmax(axis=0).compute())
        out2 = _engaged(lambda: x.argmin().compute())
    np.testing.assert_array_equal(np.asarray(out), src.argmax(axis=0))
    assert int(out2) == src.argmin()


def test_arg_reduction_tie_first_occurrence(mesh8):
    # ties resolve to the FIRST occurrence in global order even when the
    # later tie lives on an earlier device slot
    src = np.zeros((sum(_HEIGHTS), 6))
    src[77, 3] = 5.0
    src[30, 3] = 5.0
    x = da.from_array(src, chunks=(_HEIGHTS, 6))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: x.argmax().compute())
        out2 = _engaged(lambda: x.argmax(axis=0).compute())
    assert int(out) == src.argmax()
    np.testing.assert_array_equal(np.asarray(out2), src.argmax(axis=0))


def test_arg_reduction_bool_and_int(mesh8):
    rng = np.random.default_rng(96)
    srcb = rng.standard_normal((sum(_HEIGHTS), 4)) > 0.5
    srci = rng.integers(-100, 100, size=(sum(_HEIGHTS), 4)).astype(np.int32)
    xb = da.from_array(srcb, chunks=(_HEIGHTS, 4))
    xi = da.from_array(srci, chunks=(_HEIGHTS, 4))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        ob = _engaged(lambda: xb.argmax(axis=0).compute())
        oi = _engaged(lambda: xi.argmin(axis=0).compute())
    np.testing.assert_array_equal(np.asarray(ob), srcb.argmax(axis=0))
    np.testing.assert_array_equal(np.asarray(oi), srci.argmin(axis=0))


def test_nanarg_declines(mesh8, irregular):
    # nanarg kinds stay out: their all-NaN raise happens at host fetch,
    # which the lane's direct result would bypass
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        before = ENGAGED["count"]
        out = da.nanargmax(x, axis=0).compute()
        assert ENGAGED["count"] == before
    np.testing.assert_array_equal(np.asarray(out), np.nanargmax(src, axis=0))


# ---- 2-D-grid arg reductions (round-4 ADVICE high: the g2_argreduce plan
# kinds existed with no executor and fell through to the elemwise block) ----


def test_grid2_argreduce_full(mesh8):
    # the ADVICE repro: argmin() on a 2-D chunk grid used to crash with
    # "attempt to get argmin of an empty sequence"
    src = np.random.default_rng(97).standard_normal((32, 24))
    x = da.from_array(src, chunks=((9, 4, 13, 6), (11, 2, 7, 4)))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        o_min = _engaged(lambda: x.argmin().compute())
        o_max = _engaged(lambda: da.argmax(x * 2 - 1).compute())
    assert int(o_min) == src.argmin()
    assert int(o_max) == (src * 2 - 1).argmax()


def test_grid2_argreduce_local_unchunked_axis(mesh8):
    # argmin(axis=1) on a 3-D array chunked at axes (0, 2): positions
    # along the unchunked middle axis are block-local truths
    src = np.random.default_rng(98).standard_normal((14, 5, 12))
    x = da.from_array(src, chunks=((3, 7, 4), 5, (5, 3, 4)))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        o_min = _engaged(lambda: x.argmin(axis=1).compute())
        o_max = _engaged(lambda: x.argmax(axis=1).compute())
    np.testing.assert_array_equal(np.asarray(o_min), src.argmin(axis=1))
    np.testing.assert_array_equal(np.asarray(o_max), src.argmax(axis=1))


def test_grid2_argreduce_full_nan_and_ties(mesh8):
    # a valid NaN anywhere wins the full-flatten vote; ties resolve to the
    # FIRST occurrence in global row-major order across both chunked axes
    src = np.zeros((sum(_H2A), sum(_H2B)))
    src[20, 30] = 5.0
    src[6, 2] = 5.0
    x = da.from_array(src, chunks=(_H2A, _H2B))
    srcn = src.copy()
    srcn[17, 21] = np.nan
    xn = da.from_array(srcn, chunks=(_H2A, _H2B))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        o_tie = _engaged(lambda: x.argmax().compute())
        o_nan = _engaged(lambda: xn.argmax().compute())
    assert int(o_tie) == src.argmax()
    assert int(o_nan) == srcn.argmax()


def test_grid2_argreduce_bool_and_int(mesh8):
    rng = np.random.default_rng(99)
    srcb = rng.standard_normal((sum(_H2A), sum(_H2B))) > 0.7
    srci = rng.integers(-50, 50, size=(sum(_H2A), sum(_H2B))).astype(np.int32)
    xb = da.from_array(srcb, chunks=(_H2A, _H2B))
    xi = da.from_array(srci, chunks=(_H2A, _H2B))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        ob = _engaged(lambda: xb.argmax().compute())
        oi = _engaged(lambda: xi.argmin().compute())
    assert int(ob) == srcb.argmax()
    assert int(oi) == srci.argmin()


def test_grid2_argreduce_straddle_both_axes(mesh8, grid2d):
    # arg-extremum ALONG each chunked axis: the grouped global-index vote
    # (g2_argreduce_straddle) — rows keep per-column winners, cols keep
    # per-row winners
    src, x = grid2d
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        o0 = _engaged(lambda: x.argmin(axis=0).compute())
        o1 = _engaged(lambda: x.argmax(axis=1).compute())
        om = _engaged(lambda: da.argmax(x * 2 - 1, axis=0).compute())
    np.testing.assert_array_equal(np.asarray(o0), src.argmin(axis=0))
    np.testing.assert_array_equal(np.asarray(o1), src.argmax(axis=1))
    np.testing.assert_array_equal(
        np.asarray(om), (src * 2 - 1).argmax(axis=0)
    )


def test_grid2_argreduce_straddle_nan_and_ties(mesh8):
    # per-slice: a valid NaN anywhere in the reduced slice wins that
    # output element's vote; ties resolve to the FIRST (lowest) global
    # index along the reduced axis, across block boundaries
    src = np.zeros((sum(_H2A), sum(_H2B)))
    src[20, 3] = 5.0
    src[6, 3] = 5.0   # tie in column 3: row 6 (earlier block) must win
    src[17, 21] = np.nan  # column 21: the NaN wins argmax
    x = da.from_array(src, chunks=(_H2A, _H2B))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: x.argmax(axis=0).compute())
    np.testing.assert_array_equal(np.asarray(out), src.argmax(axis=0))


def test_grid2_argreduce_straddle_3d_and_int(mesh8):
    # 3-D array chunked at axes (0, 2): reduce along chunked axis 2 with
    # the unchunked middle axis riding along; int and bool dtypes
    rng = np.random.default_rng(101)
    src = rng.integers(-50, 50, size=(14, 5, 12)).astype(np.int32)
    x = da.from_array(src, chunks=((3, 7, 4), 5, (5, 3, 4)))
    srcb = rng.standard_normal((sum(_H2A), sum(_H2B))) > 0.8
    xb = da.from_array(srcb, chunks=(_H2A, _H2B))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        o2 = _engaged(lambda: x.argmin(axis=2).compute())
        o0 = _engaged(lambda: x.argmax(axis=0).compute())
        ob = _engaged(lambda: xb.argmax(axis=1).compute())
    np.testing.assert_array_equal(np.asarray(o2), src.argmin(axis=2))
    np.testing.assert_array_equal(np.asarray(o0), src.argmax(axis=0))
    np.testing.assert_array_equal(np.asarray(ob), srcb.argmax(axis=1))


def test_grid2_cumsum_no_quadratic_constant(mesh8, grid2d):
    # the Blelloch carry mask must be built in-trace (iota arithmetic),
    # never baked as a (kpad, kpad) jit constant (remote-compile HTTP 413
    # guard); pin by checking the lowered HLO has no large bool constant
    import jax

    src, x = grid2d
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: da.cumsum(x, axis=0).compute())
    np.testing.assert_allclose(
        np.asarray(out), np.cumsum(src, axis=0), rtol=1e-10
    )


def test_trim_internal_root_declines_not_crashes(mesh8, irregular):
    # a TrimInternal root (the map_overlap pipeline) used to NameError out
    # of the lane (`_plan_stencil` referenced before it existed); it must
    # decline (or engage) and compute the right values either way
    src, x = irregular
    y = da.map_overlap(lambda b: b * 2, x, depth=1, boundary="reflect")
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = y.compute()
    np.testing.assert_allclose(np.asarray(out), src * 2, rtol=1e-12)


# ---------------------------------------------------------------------------
# auto engagement (VERDICT r4 #3): under the DEFAULT lane="auto" a mesh
# routes matching IRREGULAR-grid programs through the shard lane by itself
# ---------------------------------------------------------------------------


def test_auto_engages_irregular_without_override(mesh8, irregular):
    src, x = irregular
    with use_mesh(mesh8):  # no config override — default lane is "auto"
        out = _engaged(lambda: (x * 2 + 1).sum().compute())
    assert float(out) == pytest.approx(float((src * 2 + 1).sum()), rel=1e-10)


def test_auto_engages_irregular_matmul(mesh8, irregular):
    src, x = irregular
    w = np.random.default_rng(7).standard_normal((6, 3))
    with use_mesh(mesh8):
        out = _engaged(lambda: (x @ w).compute())
    np.testing.assert_allclose(np.asarray(out), src @ w, rtol=1e-10)


def test_auto_engages_irregular_scan(mesh8, irregular):
    src, x = irregular
    with use_mesh(mesh8):
        out = _engaged(lambda: da.cumsum(x, axis=0).compute())
    np.testing.assert_allclose(np.asarray(out), np.cumsum(src, axis=0), rtol=1e-10)


def test_auto_engages_irregular_grid2(mesh8, grid2d):
    src, x = grid2d
    with use_mesh(mesh8):
        out = _engaged(lambda: ((x - x.mean()) / x.std()).compute())
    np.testing.assert_allclose(
        np.asarray(out), (src - src.mean()) / src.std(), rtol=1e-8
    )


def test_auto_skips_regular_grid(mesh8):
    # a REGULAR grid keeps the default GSPMD one-program lane: its layout
    # solver already maps even grids cleanly, and the lane's stack/unstack
    # round-trip would only add overhead
    src = np.random.default_rng(8).standard_normal((128, 6))
    x = da.from_array(src, chunks=(32, 6))
    with use_mesh(mesh8):
        before = ENGAGED["count"]
        out = (x + 1).sum().compute()
        assert ENGAGED["count"] == before, "lane engaged on a regular grid"
    assert float(out) == pytest.approx(float((src + 1).sum()), rel=1e-10)


def test_gspmd_value_turns_lane_off(mesh8, irregular):
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "gspmd"}):
        before = ENGAGED["count"]
        out = (x + 1).sum().compute()
        assert ENGAGED["count"] == before, "lane engaged under lane=gspmd"
    assert float(out) == pytest.approx(float((src + 1).sum()), rel=1e-10)


def test_forced_lane_still_engages_regular(mesh8):
    # explicit "shard-map" keeps forcing the lane wherever the plan
    # matches, regular grids included (the pre-promotion contract)
    src = np.random.default_rng(9).standard_normal((128, 6))
    x = da.from_array(src, chunks=(32, 6))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        out = _engaged(lambda: (x + 1).sum().compute())
    assert float(out) == pytest.approx(float((src + 1).sum()), rel=1e-10)


def test_auto_skips_eager_lane(mesh8, irregular):
    # the eager differential lane (tpu.jit=False) must stay pure per-value
    # execution: auto engagement would reroute it through a compiled path
    src, x = irregular
    with use_mesh(mesh8), config.set({"tpu.jit": False}):
        before = ENGAGED["count"]
        out = (x + 1).sum().compute()
        assert ENGAGED["count"] == before, "lane engaged in the eager lane"
    assert float(out) == pytest.approx(float((src + 1).sum()), rel=1e-10)


def test_auto_degrades_on_lane_failure(mesh8, irregular, monkeypatch):
    # degrade-never-fail: any lane blowup under "auto" falls through to
    # the default lanes (a program that executed before the promotion must
    # keep executing); explicit "shard-map" still surfaces the error
    import dask_array_tpu.parallel.shardlane as SL

    def boom(root, mesh, auto=False):
        raise RuntimeError("synthetic lane failure")

    monkeypatch.setattr(SL, "try_execute_shard", boom)
    src, x = irregular
    with use_mesh(mesh8):
        out = (x + 1).sum().compute()
    assert float(out) == pytest.approx(float((src + 1).sum()), rel=1e-10)
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        with pytest.raises(RuntimeError, match="synthetic lane failure"):
            (x * 3).sum().compute()


# ---------------------------------------------------------------------------
# inner scans (r5 multi-terminal widening): CumReduction nodes INSIDE
# elemwise trees stay block-aligned — elemwise-after-scan, scan-of-scan,
# reduce-of-scan and mixed pipelines are each ONE lane program
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name,build,want_fn",
    [
        (
            "elemwise-over-scan",
            lambda x: da.cumsum(x, axis=0) * 2 + 1,
            lambda s: np.cumsum(s, 0) * 2 + 1,
        ),
        (
            "elemwise-after-scan-sum",
            lambda x: (x - da.cumsum(x, axis=0)).sum(),
            lambda s: (s - np.cumsum(s, 0)).sum(),
        ),
        (
            "scan-of-scan",
            lambda x: da.cumsum(da.cumsum(x, axis=0), axis=1),
            lambda s: np.cumsum(np.cumsum(s, 0), 1),
        ),
        (
            "reduce-of-scan",
            lambda x: da.cumsum(x, axis=0).sum(axis=0),
            lambda s: np.cumsum(s, 0).sum(0),
        ),
        (
            "inner-scan-in-tree",
            lambda x: (x * da.cumsum(x, axis=0)).mean(axis=0),
            lambda s: (s * np.cumsum(s, 0)).mean(0),
        ),
        (
            "scan-with-inner-red",
            lambda x: da.cumsum(x - x.mean(), axis=0),
            lambda s: np.cumsum(s - s.mean(), 0),
        ),
        (
            "cumprod-inner",
            lambda x: (da.cumprod(x * 0.1, axis=0) + 1).sum(),
            lambda s: (np.cumprod(s * 0.1, 0) + 1).sum(),
        ),
        (
            "local-axis-inner-scan",
            lambda x: da.cumsum(x, axis=1) * 2,
            lambda s: np.cumsum(s, 1) * 2,
        ),
        (
            "argmax-of-scan",
            lambda x: da.cumsum(x, axis=0).argmax(),
            lambda s: np.cumsum(s, 0).argmax(),
        ),
        (
            "scan-minus-scan",
            lambda x: da.cumsum(x, axis=0) - da.cumsum(x, axis=1),
            lambda s: np.cumsum(s, 0) - np.cumsum(s, 1),
        ),
    ],
)
def test_inner_scan_pipelines(mesh8, irregular, name, build, want_fn):
    src, x = irregular
    with use_mesh(mesh8):  # default lane="auto": irregular grids engage
        out = _engaged(lambda: build(x).compute())
    np.testing.assert_allclose(
        np.asarray(out), want_fn(src), rtol=1e-9, atol=1e-9
    )


def test_inner_scan_int_dtype(mesh8):
    heights = (5, 9, 3)
    src = np.arange(17 * 4, dtype=np.int64).reshape(17, 4) % 13
    x = da.from_array(src, chunks=(heights, 4))
    with use_mesh(mesh8):
        out = _engaged(lambda: (da.cumsum(x, axis=0) + x).compute())
    np.testing.assert_array_equal(np.asarray(out), np.cumsum(src, 0) + src)


@pytest.mark.skipif(
    __import__("os").environ.get("DA_TPU_MODE") == "eager",
    reason="traffic pin: auto engagement (and its collectives) is trace-lane only",
)
def test_inner_scan_one_totals_allgather_only(mesh8, irregular, monkeypatch):
    # the Blelloch pin, widened to inner scans: the only all-gather in the
    # program is the tiny per-device TOTALS exchange (shape == rest), never
    # the array
    import jax

    calls = []
    orig = jax.lax.all_gather

    def spy(operand, *a, **k):
        calls.append(tuple(operand.shape))
        return orig(operand, *a, **k)

    monkeypatch.setattr(jax.lax, "all_gather", spy)
    src, x = irregular
    with use_mesh(mesh8):
        out = _engaged(lambda: (x - da.cumsum(x, axis=0)).sum().compute())
    assert float(out) == pytest.approx(
        float((src - np.cumsum(src, 0)).sum()), rel=1e-9
    )
    assert calls == [(6,)], calls  # one gather, rest-shaped totals


def test_inner_scan_shared_subexpression(mesh8, irregular):
    # the SAME scan node referenced twice evaluates once (env-memoized)
    src, x = irregular
    c = da.cumsum(x, axis=0)
    with use_mesh(mesh8):
        out = _engaged(lambda: (c + c * 0.5).compute())
    np.testing.assert_allclose(
        np.asarray(out), np.cumsum(src, 0) * 1.5, rtol=1e-9
    )


def test_inner_scan_grid2_chunked_axis(mesh8, grid2d):
    # inner scans along a CHUNKED axis of a 2-D grid ride the lane: the
    # grouped Blelloch schedule (g2_scan) runs inside the body
    src, x = grid2d
    with use_mesh(mesh8):
        o0 = _engaged(lambda: (da.cumsum(x, axis=0) + 1).compute())
        o1 = _engaged(lambda: (da.cumsum(x, axis=1) * 2 - x).compute())
    np.testing.assert_allclose(np.asarray(o0), np.cumsum(src, 0) + 1, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(o1), np.cumsum(src, 1) * 2 - src, rtol=1e-9
    )


def test_inner_scan_grid2_composed_with_reduction(mesh8, grid2d):
    # scan-then-reduce over BOTH chunked axes: the scan's padded slots
    # must stay excluded by the validity mask
    src, x = grid2d
    with use_mesh(mesh8):
        out = _engaged(lambda: (x - da.cumsum(x, axis=0)).sum().compute())
        op = _engaged(
            lambda: (da.cumprod(x * 0.01 + 1, axis=1) * 2).compute()
        )
    assert float(out) == pytest.approx(
        float((src - np.cumsum(src, 0)).sum()), rel=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(op), np.cumprod(src * 0.01 + 1, 1) * 2, rtol=1e-9
    )


def test_inner_scan_grid2_scan_of_scan(mesh8, grid2d):
    # scan-of-scan across BOTH chunked axes of the 2-D grid: two grouped
    # Blelloch schedules compose in one program
    src, x = grid2d
    with use_mesh(mesh8):
        out = _engaged(
            lambda: da.cumsum(da.cumsum(x, axis=0), axis=1).compute()
        )
    np.testing.assert_allclose(
        np.asarray(out), np.cumsum(np.cumsum(src, 0), 1), rtol=1e-8
    )


def test_inner_scan_eager_lane_parity(mesh8, irregular):
    # the eager differential lane answers the same pipelines per-value
    src, x = irregular
    with config.set({"tpu.jit": False}):
        out = (x - da.cumsum(x, axis=0)).sum().compute()
    assert float(out) == pytest.approx(
        float((src - np.cumsum(src, 0)).sum()), rel=1e-9
    )


# ---------------------------------------------------------------------------
# post-elemwise over matmul (r5): f(x @ w) — the GEMM-then-activation
# pattern rides the matmul lanes, outer tree applied per-device in-body
# ---------------------------------------------------------------------------


@pytest.fixture
def w6x3():
    return np.random.default_rng(11).standard_normal((6, 3))


def test_post_elem_rows_lane(mesh8, irregular, w6x3):
    src, x = irregular
    with use_mesh(mesh8):
        out = _engaged(lambda: (x @ w6x3 + 1.0).compute())
    np.testing.assert_allclose(np.asarray(out), src @ w6x3 + 1.0, rtol=1e-9)


def test_post_elem_activation(mesh8, irregular, w6x3):
    src, x = irregular
    with use_mesh(mesh8):
        out = _engaged(lambda: da.tanh(2.0 * (x @ w6x3)).compute())
    np.testing.assert_allclose(
        np.asarray(out), np.tanh(2.0 * (src @ w6x3)), rtol=1e-9, atol=1e-12
    )


def test_post_elem_contraction_lane(mesh8):
    src = np.random.default_rng(12).standard_normal((23, 6))
    w = np.random.default_rng(13).standard_normal((6, 3))
    xk = da.from_array(src, chunks=(23, (4, 2)))  # contraction-chunked
    with use_mesh(mesh8):
        out = _engaged(lambda: ((xk @ w) * 0.5 + 2.0).compute())
    np.testing.assert_allclose(
        np.asarray(out), (src @ w) * 0.5 + 2.0, rtol=1e-9
    )


def test_post_elem_shared_gemm(mesh8, irregular, w6x3):
    # the same Einsum referenced twice contracts once (env-memoized)
    src, x = irregular
    mm = x @ w6x3
    with use_mesh(mesh8):
        out = _engaged(lambda: (mm + mm * 0.5).compute())
    np.testing.assert_allclose(
        np.asarray(out), (src @ w6x3) * 1.5, rtol=1e-9
    )


def test_post_elem_two_gemms_decline(mesh8, irregular, w6x3):
    # TWO distinct Einsums in one tree stay out of the lane; the default
    # lanes still answer correctly
    src, x = irregular
    w2 = np.random.default_rng(14).standard_normal((6, 3))
    with use_mesh(mesh8):
        before = ENGAGED["count"]
        out = ((x @ w6x3) + (x @ w2)).compute()
        assert ENGAGED["count"] == before
    np.testing.assert_allclose(
        np.asarray(out), src @ w6x3 + src @ w2, rtol=1e-9
    )


def test_post_elem_other_leaf_declines(mesh8, irregular, w6x3):
    # an extra array leaf in the outer tree (needs restacking by the
    # OUTPUT grid) declines; values still correct via the default lanes
    src, x = irregular
    other = np.random.default_rng(15).standard_normal((sum(_HEIGHTS), 3))
    y = da.from_array(other, chunks=(_HEIGHTS, 3))
    with use_mesh(mesh8):
        before = ENGAGED["count"]
        out = ((x @ w6x3) + y).compute()
        assert ENGAGED["count"] == before
    np.testing.assert_allclose(
        np.asarray(out), src @ w6x3 + other, rtol=1e-9
    )


def test_post_elem_bias_add_rows_lane(mesh8, irregular, w6x3):
    # the bias-add pattern: extra array leaves that never touch the
    # chunked rows axis replicate whole into the body — (N,) and (1, N)
    src, x = irregular
    b = np.random.default_rng(16).standard_normal((3,))
    b2 = np.random.default_rng(17).standard_normal((1, 3))
    db = da.from_array(b, chunks=3)
    db2 = da.from_array(b2, chunks=(1, 3))
    with use_mesh(mesh8):
        out = _engaged(lambda: da.tanh(x @ w6x3 + db).compute())
        out2 = _engaged(lambda: ((x @ w6x3) * db2 + db).compute())
    np.testing.assert_allclose(
        np.asarray(out), np.tanh(src @ w6x3 + b), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out2), (src @ w6x3) * b2 + b, rtol=1e-9
    )


def test_post_elem_bias_add_contraction_lane(mesh8):
    # matmul_k's output is replicated: ANY broadcastable leaf binds —
    # including one spanning the output rows
    src = np.random.default_rng(18).standard_normal((23, 6))
    w = np.random.default_rng(19).standard_normal((6, 3))
    b = np.random.default_rng(20).standard_normal((3,))
    full = np.random.default_rng(21).standard_normal((23, 3))
    xk = da.from_array(src, chunks=(23, (4, 2)))  # contraction-chunked
    db = da.from_array(b, chunks=3)
    dfull = da.from_array(full, chunks=(23, 3))
    with use_mesh(mesh8):
        out = _engaged(lambda: (xk @ w + db).compute())
        out2 = _engaged(lambda: ((xk @ w) - dfull).compute())
    np.testing.assert_allclose(np.asarray(out), src @ w + b, rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(out2), src @ w - full, rtol=1e-9
    )


def test_post_elem_rows_hlo_no_collective(mesh8, irregular, w6x3, monkeypatch):
    # the rows lane's zero-collective contract survives the post tree:
    # no all_gather is ever traced for f(x @ w)
    import jax

    calls = []
    orig = jax.lax.all_gather

    def spy(operand, *a, **k):
        calls.append(tuple(operand.shape))
        return orig(operand, *a, **k)

    monkeypatch.setattr(jax.lax, "all_gather", spy)
    src, x = irregular
    with use_mesh(mesh8):
        out = _engaged(lambda: (x @ w6x3 + 1.0).compute())
    np.testing.assert_allclose(np.asarray(out), src @ w6x3 + 1.0, rtol=1e-9)
    assert calls == [], calls


# ---------------------------------------------------------------------------
# in-lane halo stencils (r5): TrimInternal-over-map_blocks-over-Overlap
# runs stacked on the mesh — neighbor halos by shifted takes + ONE edge-band
# ppermute per direction, boundary fills per kind, func per block, trim
# ---------------------------------------------------------------------------


def _edge3(b):
    import jax.numpy as jnp

    return b + jnp.roll(b, 1, 0) + jnp.roll(b, -1, 0)


def _np_edge3(a, bd, depth=1):
    mode = {"periodic": "wrap", "reflect": "symmetric", "nearest": "edge"}.get(bd)
    if mode is None:
        p = np.pad(a, ((depth, depth), (0, 0)), constant_values=bd)
    else:
        p = np.pad(a, ((depth, depth), (0, 0)), mode=mode)
    return (p + np.roll(p, 1, 0) + np.roll(p, -1, 0))[depth:-depth]


@pytest.mark.parametrize("bd", ["periodic", "reflect", "nearest", 0.0, 2.5])
def test_stencil_in_lane_boundaries(mesh8, irregular, bd):
    src, x = irregular
    with use_mesh(mesh8):
        out = _engaged(
            lambda: x.map_overlap(_edge3, depth={0: 1}, boundary={0: bd}).compute()
        )
    np.testing.assert_allclose(np.asarray(out), _np_edge3(src, bd), rtol=1e-9)


def test_stencil_in_lane_2d_depth(mesh8, irregular):
    # chunked axis rides the ring; the unchunked axis is global-boundary
    # padding, handled block-locally
    import jax.numpy as jnp

    def lap(b):
        return (
            jnp.roll(b, 1, 0) + jnp.roll(b, -1, 0)
            + jnp.roll(b, 1, 1) + jnp.roll(b, -1, 1) - 4 * b
        )

    src, x = irregular
    with use_mesh(mesh8):
        out = _engaged(
            lambda: x.map_overlap(lap, depth=1, boundary="reflect").compute()
        )
    p = np.pad(src, 1, mode="symmetric")
    want = p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] - 4 * src
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-9)


def test_stencil_in_lane_depth2_periodic(mesh8, irregular):
    import jax.numpy as jnp

    def f5(b):
        return b + jnp.roll(b, 2, 0) + jnp.roll(b, -2, 0)

    src, x = irregular
    with use_mesh(mesh8):
        out = _engaged(
            lambda: x.map_overlap(
                f5, depth={0: 2}, boundary={0: "periodic"}
            ).compute()
        )
    p = np.pad(src, ((2, 2), (0, 0)), mode="wrap")
    want = (p + np.roll(p, 2, 0) + np.roll(p, -2, 0))[2:-2]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-9)


def test_stencil_in_lane_elemwise_producer(mesh8, irregular):
    # an elemwise tree UNDER the overlap stays in the same program
    src, x = irregular
    with use_mesh(mesh8):
        out = _engaged(
            lambda: (x * 2 + 1).map_overlap(
                _edge3, depth={0: 1}, boundary={0: "reflect"}
            ).compute()
        )
    np.testing.assert_allclose(
        np.asarray(out), _np_edge3(src * 2 + 1, "reflect"), rtol=1e-9
    )


@pytest.mark.skipif(
    __import__("os").environ.get("DA_TPU_MODE") == "eager",
    reason="traffic pin: auto engagement (and its collectives) is trace-lane only",
)
def test_stencil_edge_band_ppermute_only(mesh8, irregular, monkeypatch):
    # the traffic pin: the only collectives are the edge-band ppermutes —
    # each operand is (depth, trailing)-shaped, never a block or the array
    import jax

    calls = []
    orig_pp = jax.lax.ppermute
    orig_ag = jax.lax.all_gather

    def spy_pp(operand, *a, **k):
        calls.append(("ppermute", tuple(operand.shape)))
        return orig_pp(operand, *a, **k)

    def spy_ag(operand, *a, **k):
        calls.append(("all_gather", tuple(operand.shape)))
        return orig_ag(operand, *a, **k)

    monkeypatch.setattr(jax.lax, "ppermute", spy_pp)
    monkeypatch.setattr(jax.lax, "all_gather", spy_ag)
    src, x = irregular
    with use_mesh(mesh8):
        out = _engaged(
            lambda: x.map_overlap(
                _edge3, depth={0: 1}, boundary={0: "reflect"}
            ).compute()
        )
    np.testing.assert_allclose(np.asarray(out), _np_edge3(src, "reflect"), rtol=1e-9)
    assert calls == [("ppermute", (1, 6)), ("ppermute", (1, 6))], calls


def test_stencil_block_id_declines(mesh8, irregular):
    # block_id injection reads global coordinates the stacked layout
    # renumbers — stays out of the lane, values still correct
    src, x = irregular

    def f(b, block_id=None):
        return b + block_id[0]

    y = x.map_overlap(f, depth={0: 1}, boundary={0: "reflect"}, dtype=src.dtype)
    with use_mesh(mesh8):
        before = ENGAGED["count"]
        out = y.compute()
        assert ENGAGED["count"] == before, "lane engaged on block_id func"
    blocks = [np.full((h,), i) for i, h in enumerate(_HEIGHTS)]
    want = _np_edge3(src, "reflect") * 0 + src + np.concatenate(blocks)[:, None]
    # (the func ignores halos: b + block_id over the padded block, trimmed)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-9)


def test_stencil_small_block_declines(mesh8):
    # a donating block smaller than the halo can't fill the edge band from
    # valid rows alone: decline (upstream overlap() may rechunk; if the
    # grid arrives with a too-small block the lane stays out)
    src = np.random.default_rng(20).standard_normal((10, 3))
    x = da.from_array(src, chunks=((4, 1, 5), 3))
    with use_mesh(mesh8):
        before = ENGAGED["count"]
        out = x.map_overlap(
            _edge3, depth={0: 2}, boundary={0: "reflect"}
        ).compute()
    np.testing.assert_allclose(
        np.asarray(out), _np_edge3(src, "reflect", depth=2), rtol=1e-9
    )


@pytest.mark.parametrize("seed", range(6))
def test_stencil_fuzz_differential(mesh8, seed):
    # randomized grids x depths x boundaries vs numpy: the stencil lane's
    # neighbor/wrap/boundary index arithmetic across uneven block layouts
    import jax.numpy as jnp

    rng = np.random.default_rng(100 + seed)
    nblocks = int(rng.integers(2, 14))
    heights = tuple(int(h) for h in rng.integers(3, 9, nblocks))
    cols = int(rng.integers(1, 5))
    depth = int(rng.integers(1, 3))
    bd = ["periodic", "reflect", "nearest", 1.5][int(rng.integers(0, 4))]
    src = rng.standard_normal((sum(heights), cols))
    x = da.from_array(src, chunks=(heights, cols))

    def f(b, dd=depth):
        return b + jnp.roll(b, dd, 0) + jnp.roll(b, -dd, 0)

    with use_mesh(mesh8):
        out = _engaged(
            lambda: x.map_overlap(f, depth={0: depth}, boundary={0: bd}).compute()
        )
    mode = {"periodic": "wrap", "reflect": "symmetric", "nearest": "edge"}.get(bd)
    if mode is None:
        p = np.pad(src, ((depth, depth), (0, 0)), constant_values=bd)
    else:
        p = np.pad(src, ((depth, depth), (0, 0)), mode=mode)
    want = (p + np.roll(p, depth, 0) + np.roll(p, -depth, 0))[depth:-depth]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-9, atol=1e-9)


# ---------------------------------------------------------------------------
# g2 inner scans (r5): block-local scans along UNCHUNKED axes of 2-D grids
# ride the lane inside elemwise trees; chunked-axis inner scans decline
# ---------------------------------------------------------------------------


@pytest.fixture
def grid2_3d():
    src = np.random.default_rng(31).standard_normal((13, 9, 4))
    x = da.from_array(src, chunks=((5, 3, 5), (4, 2, 3), 4))
    return src, x


def test_g2_inner_scan_local_axis(mesh8, grid2_3d):
    src, x = grid2_3d
    with use_mesh(mesh8):
        out = _engaged(lambda: (da.cumsum(x, axis=2) * 2 + x).compute())
    np.testing.assert_allclose(
        np.asarray(out), np.cumsum(src, 2) * 2 + src, rtol=1e-9
    )


def test_g2_inner_scan_then_reduce(mesh8, grid2_3d):
    src, x = grid2_3d
    with use_mesh(mesh8):
        out = _engaged(lambda: (x - da.cumsum(x, axis=2)).sum().compute())
    assert float(out) == pytest.approx(
        float((src - np.cumsum(src, 2)).sum()), rel=1e-9
    )


def test_g2_inner_scan_chunked_axis_3d(mesh8, grid2_3d):
    # Blelloch-inside-a-tree along a CHUNKED axis of a 3-D array on a 2-D
    # grid rides the lane (g2_scan in the body)
    src, x = grid2_3d
    with use_mesh(mesh8):
        out = _engaged(lambda: (da.cumsum(x, axis=0) + 1).compute())
    np.testing.assert_allclose(np.asarray(out), np.cumsum(src, 0) + 1, rtol=1e-9)
