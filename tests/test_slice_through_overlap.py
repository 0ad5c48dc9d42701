"""Slice pushdown through the overlap pipeline (block-aligned).

The margin rewrite: a whole-output-block slice of
``TrimInternal(f(Overlap(x)))`` descends to a leaf-region read of just the
panel rows + halo, with the cut's neighbor rows carried as ``margin``
(halo-only source rows that suppress boundary handling at the cut edge).

Reference optimizer family: ``tests/test_slice_through_overlap.py`` (618
LoC, block-aligned cases); fresh design — the reference rewrites task
graphs, this rewrites the expression's leaf regions.
"""

import numpy as np
import pytest

import dask_array_tpu as da


def _laplace(blk):
    import jax.numpy as jnp

    return (
        jnp.roll(blk, 1, 0) + jnp.roll(blk, -1, 0)
        + jnp.roll(blk, 1, 1) + jnp.roll(blk, -1, 1) - 4 * blk
    )


def _leaf_regions(expr):
    return [
        node.operand("region")
        for node in expr.walk()
        if type(node).__name__ == "FromArray"
    ]


def _stencil(boundary, shape=(40, 12), chunks=(5, 12)):
    src = np.random.default_rng(42).standard_normal(shape).astype("f4")
    x = da.from_array(src, chunks=chunks)
    st = da.map_overlap(_laplace, x, depth=1, boundary=boundary, dtype="f4")
    return src, st


def _want(src, boundary):
    mode = {"reflect": "symmetric", "periodic": "wrap", "nearest": "edge"}[
        boundary
    ]
    pad = np.pad(src, 1, mode=mode)
    return (
        pad[:-2, 1:-1] + pad[2:, 1:-1] + pad[1:-1, :-2] + pad[1:-1, 2:]
        - 4 * src
    )


@pytest.mark.parametrize("boundary", ["reflect", "periodic", "nearest"])
@pytest.mark.parametrize(
    "sel", [slice(0, 5), slice(5, 10), slice(10, 20), slice(35, 40)]
)
def test_block_aligned_slice_values(boundary, sel):
    src, st = _stencil(boundary)
    got = np.asarray(st[sel].compute())
    np.testing.assert_allclose(got, _want(src, boundary)[sel], atol=1e-5)


def test_interior_panel_reads_only_its_rows():
    src, st = _stencil("reflect")
    opt = st[10:20].expr.optimize()
    regions = _leaf_regions(opt)
    assert len(regions) == 1
    (region,) = regions
    assert region is not None
    # rows 10..20 need halo rows 9 and 20: an 11-row read of the 40
    assert (region[0].start, region[0].stop) == (9, 21)


def test_edge_panel_keeps_boundary_handling():
    src, st = _stencil("reflect")
    opt = st[0:10].expr.optimize()
    (region,) = _leaf_regions(opt)
    # the true array edge stays boundary-handled: no margin row above 0
    assert (region[0].start, region[0].stop) == (0, 11)
    got = np.asarray(st[0:10].compute())
    np.testing.assert_allclose(got, _want(src, "reflect")[0:10], atol=1e-5)


def test_unaligned_slice_stays_outside_but_computes():
    src, st = _stencil("reflect")
    got = np.asarray(st[3:17].compute())
    np.testing.assert_allclose(got, _want(src, "reflect")[3:17], atol=1e-5)


def test_non_halo_axis_commutes_with_halo_axis():
    src, st = _stencil("reflect")
    got = np.asarray(st[5:10, 2:7].compute())
    np.testing.assert_allclose(
        got, _want(src, "reflect")[5:10, 2:7], atol=1e-5
    )
    opt = st[5:10, 2:7].expr.optimize()
    (region,) = _leaf_regions(opt)
    assert (region[0].start, region[0].stop) == (4, 11)


def test_constant_boundary_panel():
    src = np.random.default_rng(7).standard_normal((30, 8)).astype("f4")
    x = da.from_array(src, chunks=(5, 8))
    st = da.map_overlap(_laplace, x, depth=1, boundary=0.0, dtype="f4")
    pad = np.pad(src, 1, mode="constant")
    want = (
        pad[:-2, 1:-1] + pad[2:, 1:-1] + pad[1:-1, :-2] + pad[1:-1, 2:]
        - 4 * src
    )
    for sel in (slice(0, 5), slice(10, 20), slice(25, 30)):
        got = np.asarray(st[sel].compute())
        np.testing.assert_allclose(got, want[sel], atol=1e-5)


def test_asymmetric_depth_panels():
    src = np.random.default_rng(8).standard_normal((36, 6)).astype("f4")
    x = da.from_array(src, chunks=(6, 6))

    def shift_sum(blk):
        import jax.numpy as jnp

        return jnp.roll(blk, 2, 0) + jnp.roll(blk, -1, 0)

    st = da.map_overlap(
        shift_sum, x, depth={0: (2, 1)}, boundary="none", dtype="f4"
    )
    # the margin rewrite must reproduce the framework's own full result
    # exactly, panel by panel (asymmetric lo/hi margins)
    full = np.asarray(st.compute())
    for sel in (slice(0, 6), slice(6, 18), slice(30, 36)):
        got = np.asarray(st[sel].compute())
        np.testing.assert_allclose(got, full[sel], atol=1e-5)


def test_periodic_edge_panels_stay_correct():
    # periodic wrap halo needs the array's OTHER end: edge panels must not
    # push (a contiguous leaf region can't supply the wrap), but interior
    # panels do — all stay correct either way
    src, st = _stencil("periodic")
    want = _want(src, "periodic")
    for sel in (slice(0, 5), slice(10, 20), slice(35, 40)):
        got = np.asarray(st[sel].compute())
        np.testing.assert_allclose(got, want[sel], atol=1e-5)
    # interior panel still shrinks its leaf read
    opt = st[10:20].expr.optimize()
    (region,) = _leaf_regions(opt)
    assert region is not None and (region[0].start, region[0].stop) == (9, 21)


def test_slice_of_slice_fuses_then_pushes():
    src, st = _stencil("reflect")
    y = st[5:30][5:15]  # == st[10:20], block-aligned after fusion
    got = np.asarray(y.compute())
    np.testing.assert_allclose(got, _want(src, "reflect")[10:20], atol=1e-5)


def test_overlap_trim_roundtrip_slice():
    # slicing a bare overlap->trim roundtrip (no map in between)
    src = np.random.default_rng(9).standard_normal((24, 4))
    x = da.from_array(src, chunks=(4, 4))
    y = da.trim_overlap(da.overlap(x, depth=1, boundary="reflect"), depth=1,
                        boundary="reflect")
    got = np.asarray(y[8:16].compute())
    np.testing.assert_allclose(got, src[8:16], atol=1e-12)
