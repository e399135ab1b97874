"""Variant of identify_substeps.py: hardness frozen during substeps
(h_per_substep=False), single full-dt update from the final slip rates.

If the reference's sub-incrementation applies only to the strain/rotation
update while hardness integrates once per step, this tracking run should
hold the golden error at the print floor through the ramp tail.

Usage:  python scripts/identify_substeps2.py [outfile]
"""
import dataclasses as dc
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import jax.numpy as jnp

import exaconstit_tpu.models.ecmech as ec
import exaconstit_tpu.driver as drv
from exaconstit_tpu.config.options import parse_options

_orig_build = ec.build_model


def build_h_once(opt, props):
    m = _orig_build(opt, props)
    return dc.replace(m, evptn=dc.replace(m.evptn, h_per_substep=False))


ec.build_model = build_h_once
drv.build_model = build_h_once

GOLDEN = np.loadtxt("/root/reference/test/data/voce_full_stress.txt")
TOML = "/root/reference/test/data/voce_full.toml"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/substep_id2.json"


def main():
    workdir = tempfile.mkdtemp()
    opt = parse_options(TOML)
    sim = drv.Simulation(opt, workdir=workdir)
    sysm = sim.system
    nq = sysm.fes.nqpts
    npts = sysm.ne_pad * nq

    def avg_stress(stress, x_cur):
        el_x = sysm._gather(x_cur)
        return np.asarray(sysm._vol_avg(stress, el_x, True))

    orig_compute_nsub = sysm._compute_nsub
    records = []
    for ti in range(1, sim.nsteps + 1):
        dt = float(sim.cust_dt[ti - 1])
        g = GOLDEN[ti - 1]
        gscale = np.abs(g).max()
        if ti in sim.update_steps:
            v_prev = sim.v
            sim.cur_bcs = sim.bc_steps[ti]
            sim.update_velocity()
            sim.v = sysm.solve_init(v_prev, sim.v, sim.x_beg, sim.state,
                                    dt, sim.cur_bcs.ess_mask)
        sim.update_velocity()

        if dt < 0.2 - 1e-12:
            sysm._compute_nsub = orig_compute_nsub
            v, stress, state_end, conv, nit, _ = sysm.newton_solve(
                sim.v, sim.x_beg, sim.state, dt, sim.cur_bcs.ess_mask,
                verbose=False)
            assert conv, f"step {ti} diverged"
            x_cur = sim.x_beg + dt * v
            av = avg_stress(stress, x_cur)
            err = float(np.abs(av - g).max() / gscale)
            rec = dict(step=ti, dt=dt, mode="default", err=err)
            print(f"step {ti:2d} dt={dt:5.3f} default  err={err:.3e}",
                  flush=True)
        else:
            nref = int(round(dt / 0.1))
            cands = sorted({max(1, nref - 1), nref, nref + 1})
            v_entry = sim.v
            best = None
            errs = {}
            for n in cands:
                nsub_c = jnp.full((npts,), n, dtype=jnp.int32)
                sysm._compute_nsub = lambda v, x, d, _n=nsub_c: _n
                t0 = time.time()
                v, stress, state_end, conv, nit, _ = sysm.newton_solve(
                    v_entry, sim.x_beg, sim.state, dt, sim.cur_bcs.ess_mask,
                    verbose=False)
                if not conv:
                    errs[n] = float("nan")
                    continue
                x_cur = sim.x_beg + dt * v
                av = avg_stress(stress, x_cur)
                err = float(np.abs(av - g).max() / gscale)
                errs[n] = err
                if best is None or err < best[0]:
                    best = (err, n, v, stress, state_end)
                print(f"  step {ti:2d} dt={dt:5.3f} n={n:2d} err={err:.3e} "
                      f"({time.time()-t0:.1f}s, {nit} NR)", flush=True)
            err, nbest, v, stress, state_end = best
            rec = dict(step=ti, dt=dt, mode="sweep", errs=errs, best_n=nbest,
                       err=err)
            print(f"step {ti:2d} dt={dt:5.3f} BEST n={nbest} err={err:.3e}",
                  flush=True)
        records.append(rec)
        with open(OUT, "w") as f:
            json.dump(records, f, indent=1)
        sim.v = v
        sim.x_cur = sim.x_beg + dt * v
        sim.state_prev = sim.state
        sim.stress = stress
        sim.state = state_end
        sim.x_beg = sim.x_cur
    print("done ->", OUT)


if __name__ == "__main__":
    main()
