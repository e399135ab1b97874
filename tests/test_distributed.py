"""Two-process jax.distributed run of the real CLI.

The analog of the reference's ``mpirun -np 2 mechanics -opt case.toml``
harness (test/test_mechanics.py:38): two coordinated processes, each
with 4 virtual CPU devices, run the same TOML through
``exaconstit_tpu.cli`` (which calls jax.distributed.initialize from the
cluster env) out of a SHARED working directory — the normal multi-host
launch — and must produce the single-process stress history exactly
once (rank-0 output gating, system_driver.cpp:461-548).
"""

import os
import shutil
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOML = os.path.join(REPO, "tests", "data", "tiny_voce.toml")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(nproc, pid, port, ndev):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU tunnel in children
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                     if "host_platform_device_count" not in f)
    env["XLA_FLAGS"] = \
        f"{flags} --xla_force_host_platform_device_count={ndev}".strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if nproc > 1:
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = str(nproc)
        env["JAX_PROCESS_ID"] = str(pid)
    return env


def _make_toml(workdir, slab=False):
    """tiny_voce + checkpointing and paraview output enabled, so the
    multi-process run exercises the element-sharded state/stress gathers
    (MechSystem._fetch) and the rank-0 write gating.

    slab=True: force the halo-exchange system on a slab-partitionable
    2x2x8 mesh (8 one-element-thick z-slabs over the 8 global devices,
    spanning both processes — the reference's every-run MPI domain
    decomposition, SURVEY.md section 2.3)."""
    text = open(TOML).read()
    text = text.replace("paraview = false", "paraview = true")
    text += "\n[Checkpoint]\n    steps = 1\n"
    if slab:
        text = text.replace("ncuts = [2, 2, 2]", "ncuts = [2, 2, 8]")
        text = text.replace("[Solvers]",
                            "[Solvers]\n    parallel_mode = \"slab\"")
    path = os.path.join(workdir, "tiny_voce_mp.toml")
    with open(path, "w") as f:
        f.write(text)
    # relative data files resolve against the toml's directory
    for fn in ("tiny_grains.txt", "tiny_dt.txt"):
        shutil.copy(os.path.join(REPO, "tests", "data", fn),
                    os.path.join(workdir, fn))
    if slab:  # 32 elements need 32 grain-map rows (deterministic)
        with open(os.path.join(workdir, "tiny_grains.txt"), "w") as f:
            for e in range(32):
                f.write(f"{(e * 37) % 500 + 1}\n")
    return path


def _launch(workdir, env, toml):
    os.makedirs(workdir, exist_ok=True)
    return subprocess.Popen(
        [sys.executable, "-m", "exaconstit_tpu.cli", "-opt", toml, "-q"],
        cwd=workdir, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


def test_two_process_distributed_matches_single(tmp_path):
    # Gloo's key-value exchange has a hard ~30 s deadline; on a loaded
    # single-core runner one worker can start >30 s behind the other, so
    # allow one clean retry before declaring failure.
    for attempt in range(2):
        port = _free_port()
        wd = str(tmp_path / f"attempt{attempt}")
        os.makedirs(wd, exist_ok=True)
        toml = _make_toml(wd)
        procs = [_launch(wd, _env(2, pid, port, 4), toml)
                 for pid in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
        if all(p.returncode == 0 for p in procs):
            break
        if attempt == 1:
            for pid, (p, out) in enumerate(zip(procs, outs)):
                assert p.returncode == 0, \
                    f"proc {pid} failed:\n{out[-4000:]}"
    shared = tmp_path / f"attempt{attempt}"

    # single-process reference run (8 local devices, same replicated path)
    wd1 = str(tmp_path / "single")
    os.makedirs(wd1, exist_ok=True)
    toml1 = _make_toml(wd1)
    p1 = _launch(wd1, _env(1, 0, port, 8), toml1)
    out1, _ = p1.communicate(timeout=900)
    assert p1.returncode == 0, f"single-process run failed:\n{out1[-4000:]}"

    # shared-cwd history written exactly once: duplicated/interleaved
    # rank writes would break the (2, 6) shape
    a2 = np.atleast_2d(np.loadtxt(shared / "tiny_voce_stress.txt"))
    a1 = np.atleast_2d(np.loadtxt(os.path.join(wd1, "tiny_voce_stress.txt")))
    assert a2.shape == a1.shape == (2, 6)
    np.testing.assert_allclose(a2, a1, rtol=1e-6, atol=1e-12)
    # checkpoint + vis were written through the collective gathers
    assert (shared / "checkpoint" / "checkpoint.npz").exists()
    assert (shared / "results" / "exaconstit.pvd").exists()
    ck2 = np.load(shared / "checkpoint" / "checkpoint.npz")
    ck1 = np.load(os.path.join(wd1, "checkpoint", "checkpoint.npz"))
    np.testing.assert_allclose(ck2["state"], ck1["state"],
                               rtol=1e-6, atol=1e-12)


def test_two_process_slab_matches_single(tmp_path):
    """Slab halo-exchange + jax.distributed together (round-3 verdict
    item 7): 2 processes x 4 devices, parallel_mode='slab' forced, out
    of a shared working directory; must match the 1-process 8-device
    slab run exactly (same SPMD program, different process split)."""
    for attempt in range(2):
        port = _free_port()
        wd = str(tmp_path / f"slab{attempt}")
        os.makedirs(wd, exist_ok=True)
        toml = _make_toml(wd, slab=True)
        procs = [_launch(wd, _env(2, pid, port, 4), toml)
                 for pid in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
        if all(p.returncode == 0 for p in procs):
            break
        if attempt == 1:
            for pid, (p, out) in enumerate(zip(procs, outs)):
                assert p.returncode == 0, \
                    f"slab proc {pid} failed:\n{out[-4000:]}"
    shared = tmp_path / f"slab{attempt}"

    wd1 = str(tmp_path / "slab_single")
    os.makedirs(wd1, exist_ok=True)
    toml1 = _make_toml(wd1, slab=True)
    p1 = _launch(wd1, _env(1, 0, port, 8), toml1)
    out1, _ = p1.communicate(timeout=900)
    assert p1.returncode == 0, \
        f"single-process slab run failed:\n{out1[-4000:]}"

    a2 = np.atleast_2d(np.loadtxt(shared / "tiny_voce_stress.txt"))
    a1 = np.atleast_2d(np.loadtxt(os.path.join(wd1, "tiny_voce_stress.txt")))
    assert a2.shape == a1.shape == (2, 6)
    np.testing.assert_allclose(a2, a1, rtol=1e-8, atol=1e-14)
    ck2 = np.load(shared / "checkpoint" / "checkpoint.npz")
    ck1 = np.load(os.path.join(wd1, "checkpoint", "checkpoint.npz"))
    np.testing.assert_allclose(ck2["state"], ck1["state"],
                               rtol=1e-8, atol=1e-14)
