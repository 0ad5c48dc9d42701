"""Plan-records protocol tests.

Mirrors the reference's byte-level protocol discipline
(``/root/reference/dask_array/tests/test_frisky_protocol.py``): a pure-
Python re-decoder pins the grammar, native and Python encoders must agree
byte-for-byte, malformed/mis-versioned blobs are rejected loudly, and the
fingerprint is proven to distinguish structure and to be stable across
processes.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import dask_array_tpu as da
from dask_array_tpu import native
from dask_array_tpu._planrec import (
    GRAMMAR_VERSION,
    decode_plan,
    encode_py,
    flatten_plan,
    plan_fingerprint,
    plan_records,
)


def _fp(x):
    out = plan_fingerprint(x.expr.optimize())
    assert out is not None
    return out[0]


def _pipelines():
    x = da.ones((60, 60), chunks=(20, 20))
    y = da.from_array(np.arange(144.0).reshape(12, 12), chunks=4)
    return {
        "readme": (x + x.T)[:30, :30],
        "reduce": x.sum(axis=0),
        "matmul": y @ y.T,
        "slice_step": x[::2, 1:50:3],
        "rechunk": x.rechunk((30, 30)) * 2,
        "stack": da.stack([y, y + 1], axis=0),
        "overlap": da.map_overlap(lambda b: b, y, depth=1, boundary="reflect"),
        "random": da.random.default_rng(7).normal(size=(40, 40), chunks=20) + 1,
    }


@pytest.mark.parametrize("name", sorted(_pipelines()))
def test_native_python_encoder_byte_parity(name):
    if not native.available():
        pytest.skip("native library unavailable")
    expr = _pipelines()[name].expr.optimize()
    flat = flatten_plan(expr)
    assert flat is not None
    codes, strings, _stable = flat
    blob_py = encode_py(codes, strings)
    joined = "".join(strings).encode("utf-8")
    offs = [0]
    for s in strings:
        offs.append(offs[-1] + len(s.encode("utf-8")))
    blob_nat = native.plan_encode(codes, joined, offs)
    assert blob_nat == blob_py


@pytest.mark.parametrize("name", sorted(_pipelines()))
def test_roundtrip_decode(name):
    expr = _pipelines()[name].expr.optimize()
    rec = plan_records(expr)
    assert rec is not None
    blob, _stable = rec
    d = decode_plan(blob)
    assert d["version"] == GRAMMAR_VERSION
    assert len(d["nodes"]) >= 1
    # node table is children-first: every expr ref points backwards
    for i, node in enumerate(d["nodes"]):
        assert node["type"]  # non-empty type name
    # the native validator agrees with the python decoder on the counts
    if native.available():
        info = native.plan_validate(blob)
        assert info["n_nodes"] == len(d["nodes"])
        assert info["version"] == GRAMMAR_VERSION


def test_grammar_version_rejected_by_both_decoders():
    expr = _pipelines()["readme"].expr.optimize()
    blob, _ = plan_records(expr)
    bad = bytes([blob[0] + 1]) + blob[1:]
    with pytest.raises(ValueError, match="version"):
        decode_plan(bad)
    if native.available():
        with pytest.raises(ValueError, match="version"):
            native.plan_validate(bad)


@pytest.mark.parametrize("cut", [1, 5, -3, -1])
def test_truncated_blob_rejected(cut):
    expr = _pipelines()["reduce"].expr.optimize()
    blob, _ = plan_records(expr)
    bad = blob[:cut] if cut > 0 else blob[:cut]
    with pytest.raises(ValueError):
        decode_plan(bad)
    if native.available():
        with pytest.raises(ValueError, match="malformed"):
            native.plan_validate(bad)


def test_trailing_bytes_rejected():
    expr = _pipelines()["reduce"].expr.optimize()
    blob, _ = plan_records(expr)
    with pytest.raises(ValueError):
        decode_plan(blob + b"\x00")
    if native.available():
        with pytest.raises(ValueError, match="malformed"):
            native.plan_validate(blob + b"\x00")


def test_fingerprint_distinguishes_scalars():
    x = da.ones((40, 40), chunks=20)
    assert _fp(x + 1) != _fp(x + 2)
    assert _fp(x + 1) != _fp(x + 1.0)  # int vs float literal
    assert _fp(x + 1.0) != _fp(x + 1.5)


def test_fingerprint_distinguishes_sharing_patterns():
    a = da.ones((30, 30), chunks=10)
    b = da.from_array(np.ones((30, 30)), chunks=10)
    c = da.from_array(np.ones((30, 30)), chunks=10)
    # f(A, A) vs f(A, B): same node types, different sharing
    assert _fp(a * a) != _fp(b * c)


def test_fingerprint_distinguishes_chunk_grids():
    assert _fp(da.ones((40, 40), chunks=20) + 0) != _fp(
        da.ones((40, 40), chunks=10) + 0
    )


def test_fingerprint_distinguishes_slices():
    x = da.ones((40, 40), chunks=20)
    assert _fp(x[::2]) != _fp(x[::4])
    assert _fp(x[1:]) != _fp(x[2:])
    assert _fp(x[:, 1:]) != _fp(x[1:, :])


def test_fingerprint_equal_for_equal_programs():
    def build():
        x = da.ones((40, 40), chunks=20)
        return (x + x.T)[:10].sum(axis=1)

    assert _fp(build()) == _fp(build())


def test_same_shape_different_data_share_fingerprint():
    # buffers are jit args: two same-shaped datasets share one executable
    a = da.from_array(np.arange(16.0).reshape(4, 4), chunks=2)
    b = da.from_array(np.ones((4, 4)), chunks=2)
    assert _fp(a + 1) == _fp(b + 1)
    # ...but a different dtype does not
    c = da.from_array(np.ones((4, 4), dtype=np.float32), chunks=2)
    assert _fp(a + 1) != _fp(c + 1)


def test_unstable_flag_for_identity_tokenized_operands():
    class Opaque:
        __slots__ = ("__weakref__",)

        def __reduce__(self):
            raise TypeError("unpicklable")

    x = da.ones((8,), chunks=4)
    y = da.map_blocks(
        lambda b, extra=None: b, x, extra=Opaque(), dtype=x.dtype
    )
    out = plan_fingerprint(y.expr.optimize())
    # either the plan declines entirely or it is flagged unstable
    if out is not None:
        assert out[1] is False


def test_stable_flag_for_plain_pipelines():
    expr = _pipelines()["readme"].expr.optimize()
    out = plan_fingerprint(expr)
    assert out is not None and out[1] is True


def test_cross_process_fingerprint_stability():
    code = (
        "import dask_array_tpu as da\n"
        "from dask_array_tpu._planrec import plan_fingerprint\n"
        "x = da.ones((60, 60), chunks=(20, 20))\n"
        "e = (x + x.T)[:30, :30].sum(axis=0).expr.optimize()\n"
        "print(plan_fingerprint(e)[0])\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env
    )
    assert out.returncode == 0, out.stderr[-500:]
    x = da.ones((60, 60), chunks=(20, 20))
    e = (x + x.T)[:30, :30].sum(axis=0).expr.optimize()
    assert out.stdout.strip() == plan_fingerprint(e)[0]


def test_structural_key_uses_plan_fingerprint():
    from dask_array_tpu._executor import structural_key

    x = da.ones((20, 20), chunks=10)
    key = structural_key((x + 1).expr.optimize())
    assert key.startswith("plan:")


def test_executor_cache_hits_across_rebuilds():
    # the plan-keyed executable cache must HIT for a structurally equal
    # program over fresh leaf data (the whole point of structural keying)
    from dask_array_tpu import _executor

    def run(data):
        arr = da.from_array(data, chunks=2)
        return (arr * 2 + 1).sum().compute()

    r1 = run(np.arange(16.0).reshape(4, 4))
    n_programs = len(_executor._fn_cache)
    r2 = run(np.ones((4, 4)))
    assert len(_executor._fn_cache) == n_programs  # no recompile
    assert float(r1) == np.arange(16.0).sum() * 2 + 16
    assert float(r2) == 16 * 2 + 16


def test_tuple_list_operands_do_not_alias():
    from dask_array_tpu._planrec import encode_py

    # same payload as tuple vs list must encode differently (distinct tags)
    t = encode_py([1, 0, 0, 1, 7, 2, 1, 1, 1, 2], ["X"])
    l = encode_py([1, 0, 0, 1, 11, 2, 1, 1, 1, 2], ["X"])
    assert t != l


def test_decode_rejects_forward_expr_reference():
    # hand-build a 1-node plan whose op references node 0 (itself)
    blob = encode_py([1, 0, 0, 1, 0, 0], ["X"])
    with pytest.raises(ValueError, match="forward"):
        decode_plan(blob)
    if native.available():
        with pytest.raises(ValueError, match="malformed"):
            native.plan_validate(blob)


def test_native_encoder_rejects_malformed_tape():
    if not native.available():
        pytest.skip("native library unavailable")
    # type index out of string-table range
    with pytest.raises(ValueError, match="malformed plan tape"):
        native.plan_encode([1, 5, 0, 0], b"", [0])
    # unknown op tag
    with pytest.raises(ValueError, match="malformed plan tape"):
        native.plan_encode([1, 0, 0, 1, 99], b"X", [0, 1])
    # truncated tape
    with pytest.raises(ValueError, match="malformed plan tape"):
        native.plan_encode([2, 0, 0], b"X", [0, 1])


def test_plan_table_matches_expression_types():
    x = da.ones((40, 40), chunks=20)
    expr = (x @ x).expr.optimize()
    blob, _ = plan_records(expr)
    d = decode_plan(blob)
    types = {n["type"] for n in d["nodes"]}
    expr_types = {type(n).__qualname__ for n in expr.walk()}
    assert types == expr_types
