"""Execution-parity battery: every public name must execute AND compute.

Promotion of ``bench/coverage_probe.py`` into the suite (VERDICT round-2
item 3): namespace parity is pinned by ``test_contracts``; this battery
pins EXECUTION parity — a regression that makes any public callable stop
building or computing (signature drift, lost kwargs, broken compute path)
fails loudly here with the offending names listed.
"""

import importlib.util
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def probe_results():
    spec = importlib.util.spec_from_file_location(
        "coverage_probe", os.path.join(ROOT, "bench", "coverage_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.run_probe(write_json=False, verbose=False)


def test_no_signature_miss(probe_results):
    bad = {k: v for k, v in probe_results.items() if v.startswith("signature-miss")}
    assert not bad, f"public names no longer callable with known inputs: {bad}"


def test_no_compute_errors(probe_results):
    bad = {
        k: v
        for k, v in probe_results.items()
        if v.startswith(("compute-error", "probe-error"))
    }
    assert not bad, f"public names build but fail to compute: {bad}"


def test_execution_coverage_floor(probe_results):
    # 299 callables executed at round 3; never regress below that
    ok = sum(1 for v in probe_results.values() if v == "ok")
    assert ok >= 299, f"execution coverage regressed: only {ok} names computed"


def test_every_callable_executes(probe_results):
    # the strongest form: zero guarded raises left — every public callable
    # has at least one input shape that runs end to end
    not_ok = {
        k: v for k, v in probe_results.items() if v != "ok" and not v == "attr"
    }
    assert not not_ok, f"non-executing public callables: {not_ok}"
