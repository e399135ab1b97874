"""Checkpoint / restart (io/checkpoint.py — beyond the reference, which
has no checkpointing; mechanics_driver.cpp:625-633 lists it as future
work).

1. e2e: a run interrupted at step 2 and restarted reproduces the
   continuous 4-step run (solver-tolerance agreement; the ephemeral
   material warm-start carry legitimately restarts cold).
2. BC-epoch restoration: a checkpoint taken after a BC update step must
   resume with THAT epoch's BCs, not the step-1 BCs (the round-1
   verdict's cyclic-restart bug).
"""

import os

import numpy as np
import pytest

DATA = "/root/reference/test/data"


def make_sim(tmp_path, tag, nsteps, ckpt_steps=0, restart=False):
    from exaconstit_tpu.driver import Simulation, parse_options

    opt = parse_options(os.path.join(DATA, "voce_full.toml"))
    opt.checkpoint_steps = ckpt_steps
    opt.restart = restart
    work = os.path.join(str(tmp_path), tag)
    os.makedirs(work, exist_ok=True)
    sim = Simulation(opt, workdir=work)
    sim.nsteps = nsteps
    return sim


def test_restart_matches_continuous(tmp_path):
    # continuous 4-step run
    ref = make_sim(tmp_path, "cont", 4)
    ref.run(verbose=False)

    # interrupted at step 2 (checkpoint every step), then restarted
    a = make_sim(tmp_path, "restart", 2, ckpt_steps=1)
    a.run(verbose=False)
    b = make_sim(tmp_path, "restart", 4, ckpt_steps=1, restart=True)
    b.run(verbose=False)

    st_b = b.system.from_state(b.state).copy()
    st_r = ref.system.from_state(ref.state).copy()
    # exclude the NFEVAL diagnostic column: the material warm-start
    # carry is ephemeral, so iteration counts differ across a restart
    st_b[:, :, 3] = 0.0
    st_r[:, :, 3] = 0.0
    np.testing.assert_allclose(st_b, st_r, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(b.system.from_stress(b.stress),
                               ref.system.from_stress(ref.stress),
                               rtol=1e-6, atol=1e-9)
    # the appended average-stress file must cover all 4 steps once
    got = np.atleast_2d(np.loadtxt(
        os.path.join(str(tmp_path), "restart", ref.opt.avg_stress_fname)))
    assert len(got) == 4


def test_restart_restores_bc_epoch(tmp_path):
    """save/load round-trip keeps the active BC epoch (no solves)."""
    from exaconstit_tpu.driver import Simulation, parse_options
    from exaconstit_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    opt = parse_options(os.path.join(DATA, "voce_full_cyclic.toml"))
    work = os.path.join(str(tmp_path), "cyc")
    os.makedirs(work, exist_ok=True)
    sim = Simulation(opt, workdir=work)
    epochs = sorted(sim.update_steps)
    assert len(epochs) >= 2, "cyclic case must have BC epochs"
    later = epochs[1]

    # pretend the run reached a step inside the second epoch
    sim.cur_bcs = sim.bc_steps[later]
    path = os.path.join(work, "checkpoint.npz")
    save_checkpoint(path, sim, t=0.5, ti=later + 1)

    fresh = Simulation(opt, workdir=work)
    assert fresh.cur_bcs is fresh.bc_steps[1]
    t, ti = load_checkpoint(path, fresh)
    assert ti == later + 1
    np.testing.assert_array_equal(
        np.asarray(fresh.cur_bcs.ess_mask),
        np.asarray(sim.bc_steps[later].ess_mask))
    # and the restored epoch differs from epoch 1 (otherwise this test
    # proves nothing)
    assert not np.array_equal(
        np.asarray(sim.bc_steps[1].vel_values),
        np.asarray(sim.bc_steps[later].vel_values))
