"""The driver entry points (round-4 verdict #1: the multichip gate must be
green regardless of single-chip tunnel / libtpu health).

``dryrun_multichip`` re-execs its body in a subprocess whose environment
scrubs the axon PJRT registration (PALLAS_AXON_POOL_IPS unset) and pins
JAX_PLATFORMS=cpu, so NO dispatch — eager or jitted — can reach a TPU
backend during the dryrun.  These tests pin that contract without paying
for a full dryrun.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as graft  # noqa: E402


def test_child_env_scrubs_axon_and_pins_cpu():
    base = {
        "PALLAS_AXON_POOL_IPS": "10.0.0.1",
        "JAX_PLATFORMS": "axon",
        "XLA_FLAGS": "--xla_foo=1 --xla_force_host_platform_device_count=2",
        "PATH": "/usr/bin",
    }
    env = graft._dryrun_child_env(8, base)
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "--xla_force_host_platform_device_count=2" not in env["XLA_FLAGS"]
    assert "--xla_foo=1" in env["XLA_FLAGS"]  # unrelated flags survive
    assert env["_DA_TPU_DRYRUN_CHILD"] == "1"
    assert env["PATH"] == "/usr/bin"
    assert base["JAX_PLATFORMS"] == "axon"  # caller env untouched


def test_dryrun_spawns_scrubbed_subprocess(monkeypatch):
    # dryrun_multichip must route through a subprocess built from
    # _dryrun_child_env — never run stages in a process that may already
    # hold a TPU backend
    import subprocess

    calls = {}

    def fake_run(cmd, env=None, **kw):
        calls["cmd"] = cmd
        calls["env"] = env

        class P:
            returncode = 0
            stdout = ""
            stderr = ""

        return P()

    monkeypatch.delenv("_DA_TPU_DRYRUN_CHILD", raising=False)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.9.9.9")
    monkeypatch.setattr(subprocess, "run", fake_run)
    graft.dryrun_multichip(8)
    assert calls["cmd"][0] == sys.executable
    assert calls["cmd"][1].endswith("__graft_entry__.py")
    assert calls["cmd"][2:] == ["--dryrun-child", "8"]
    assert "PALLAS_AXON_POOL_IPS" not in calls["env"]
    assert calls["env"]["JAX_PLATFORMS"] == "cpu"


def test_dryrun_child_marker_runs_body_in_process(monkeypatch):
    # inside the child the marker short-circuits straight to the body
    monkeypatch.setenv("_DA_TPU_DRYRUN_CHILD", "1")
    ran = {}
    monkeypatch.setattr(graft, "_dryrun_body", lambda n: ran.setdefault("n", n))
    graft.dryrun_multichip(4)
    assert ran["n"] == 4


def test_dryrun_child_failure_is_loud(monkeypatch):
    import subprocess

    def fake_run(cmd, env=None, **kw):
        class P:
            returncode = 1
            stdout = ""
            stderr = "boom: libtpu version mismatch"

        return P()

    monkeypatch.delenv("_DA_TPU_DRYRUN_CHILD", raising=False)
    monkeypatch.setattr(subprocess, "run", fake_run)
    with pytest.raises(RuntimeError, match="libtpu version mismatch"):
        graft.dryrun_multichip(8)


def test_entry_compiles_on_cpu():
    # the single-chip compile check: jit the flagship forward step (the
    # test conftest pins the cpu platform, so this never rides the tunnel)
    import jax

    fn, args = graft.entry()
    y = jax.jit(fn)(*args)
    assert y.shape == (512,)
    rng = np.random.default_rng(0)  # entry()'s own seeds
    a_np = rng.standard_normal((512, 512)).astype(np.float32)
    b_np = rng.standard_normal((256, 512)).astype(np.float32)
    want = graft._pipeline(a_np, b_np)
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-3, atol=2e-3)
