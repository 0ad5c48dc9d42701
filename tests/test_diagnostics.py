"""Diagnostics: trace_rewrites / explain / tier_report / expr_flow / svg."""

import io

import numpy as np
import pytest

import dask_array_tpu as da


def test_trace_rewrites_records():
    x = da.ones((100, 100), chunks=10)
    y = (x + x.T)[:20, :20]
    with da.trace_rewrites() as tr:
        y.optimize()
    rules = tr.counter()
    assert any("_accept_slice" in r for r in rules), rules
    rec = tr.records[0]
    assert rec.phase in ("simplify", "lower")
    assert rec.before != rec.after


def test_explain_report_shape():
    buf = io.StringIO()
    x = da.ones((100, 100), chunks=25)
    info = da.explain((x.rechunk(50) * 2).sum(axis=0), file=buf)
    text = buf.getvalue()
    assert "simplify:" in text and "fuse:" in text and "transfer bytes" in text
    assert set(info) >= {"simplified", "lowered", "fused", "times_ms", "transfer_bytes"}


def test_tier_report_modes():
    x = da.ones((20, 20), chunks=10)
    r1 = da.tier_report((x + 1).sum(), file=io.StringIO())
    assert r1["counts"].get("eager", 0) == 0
    r2 = da.tier_report(x[x.sum(axis=1) > 0], file=io.StringIO())
    assert r2["counts"]["eager"] >= 1


def test_expr_flow_and_svg():
    x = da.ones((50, 50), chunks=10)
    flow = da.expr_flow((x + x.T).sum(axis=0))
    assert "<svg" in flow.svg and "Reduction" in flow.svg
    html = x._repr_html_()
    assert "<svg" in html and "Chunk shape" in html
    text = da.expr_table(x + 1, file=io.StringIO())
    assert "Elemwise" in text or "add" in text


def test_chunk_report_warnings():
    buf = io.StringIO()
    txt = da.chunk_report(da.ones((10, 10), chunks=5), file=buf)
    assert "blocks" in txt


def test_simplify_convergence_valve():
    # pathological: ensure the 200-pass cap exists and doesn't trip normally
    x = da.ones((64,), chunks=8)
    for _ in range(20):
        x = (x + 1)[: len(x)]
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        x.expr.simplify()  # must converge without the valve warning
