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
    before = ENGAGED["count"]
    out = fn()
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
    # answers — values still correct (a CHUNKED rhs cannot be replicated
    # whole, so the matmul branch declines)
    src, x = irregular
    w = da.from_array(np.ones((6, 4)), chunks=(3, 2))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        before = ENGAGED["count"]
        out = (x @ w).compute()
        assert ENGAGED["count"] == before
    np.testing.assert_allclose(np.asarray(out), src @ np.ones((6, 4)), rtol=1e-10)


def test_default_lane_unchanged(mesh8, irregular):
    # default config ("auto") never routes through the lane
    src, x = irregular
    with use_mesh(mesh8):
        before = ENGAGED["count"]
        out = (x * 2).compute()
        assert ENGAGED["count"] == before
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


def test_matmul_declines_transposed_contraction(mesh8, irregular):
    # 'ji,jk->ik' contracts the SHARDED axis — out of scope, GSPMD answers
    src, x = irregular
    w = np.random.default_rng(17).standard_normal((sum(_HEIGHTS), 3))
    with use_mesh(mesh8), config.set({"tpu.execution-lane": "shard-map"}):
        before = ENGAGED["count"]
        out = da.tensordot(x, w, axes=((0,), (0,))).compute()
        assert ENGAGED["count"] == before
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


def test_two_chunked_axes_decline(mesh8):
    # more than one chunked axis stays out of scope — GSPMD answers
    src = np.random.default_rng(23).standard_normal((10, 10))
    x = da.from_array(src, chunks=((3, 7), (4, 6)))
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
