#!/usr/bin/env python3
"""Multiaxial loading-condition sweep + yield-surface fit.

Workflow-parity with the reference's ExaAM Stage3 pipeline
(workflows/Stage3: ExaCA microstructure -> ExaConstit loading sweeps ->
Barlat yield-surface fit): runs a family of constant-strain-rate
(velocity-gradient BC) simulations spanning stress space, extracts the
flow stress at a target plastic work, and fits a quadratic (Hill-type)
yield surface sigma^T M sigma = 1.  For the reference's full Barlat
Yld2004-18p fit, feed the emitted flow_states.json to barlat_fit.py.

Loading directions are deviatoric unit tensors sampled over the pi-plane
plus shear directions; each case is an independent simulation (shard
across hosts with --shard i/n, the analog of the Flux/EnTK launchers).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def loading_directions(n_axial=8, shears=True):
    """Deviatoric loading directions: pi-plane fan + simple shears."""
    dirs = []
    for th in np.linspace(0, np.pi, n_axial, endpoint=False):
        # principal deviatoric direction parameterized on the pi-plane
        d = np.diag([np.cos(th), np.cos(th + 2 * np.pi / 3),
                     np.cos(th + 4 * np.pi / 3)])
        dirs.append(d / np.linalg.norm(d))
    if shears:
        for (i, j) in [(0, 1), (0, 2), (1, 2)]:
            d = np.zeros((3, 3))
            d[i, j] = d[j, i] = 1 / np.sqrt(2)
            dirs.append(d)
    return dirs


def run_loading(toml_path, direction, rate, workdir):
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", ".."))
    from exaconstit_tpu.driver import Simulation, parse_options

    opt = parse_options(toml_path)
    # constant-strain-rate (velocity gradient) BCs on all 6 faces
    vgrad = (direction * rate).tolist()
    opt.changing_bcs = False
    opt.map_ess_id = {"total": {1: [1, 2, 3, 4, 5, 6]},
                      "ess_vel": {1: [1, 2, 3, 4, 5, 6]},
                      "ess_vgrad": {1: [1, 2, 3, 4, 5, 6]}}
    opt.map_ess_comp = {"total": {1: [-7] * 6},
                        "ess_vel": {1: [0] * 6},
                        "ess_vgrad": {1: [7] * 6}}
    opt.map_ess_vel = {1: []}
    opt.map_ess_vgrad = {1: [x for row in vgrad for x in row]}
    os.makedirs(workdir, exist_ok=True)
    sfile = os.path.join(workdir, opt.avg_stress_fname)
    if os.path.exists(sfile):
        os.remove(sfile)
    sim = Simulation(opt, workdir=workdir)
    sim.run(verbose=False)
    return np.atleast_2d(np.loadtxt(sfile))


def fit_hill(stresses):
    """Least-squares fit of s^T M s = 1 over flow-stress states (svec)."""
    # quadratic form on svec with engineering shear doubling
    rows = []
    for s in stresses:
        s = np.asarray(s)
        quad = []
        for i in range(6):
            for j in range(i, 6):
                quad.append((1.0 if i == j else 2.0) * s[i] * s[j])
        rows.append(quad)
    A = np.array(rows)
    coef, *_ = np.linalg.lstsq(A, np.ones(len(rows)), rcond=None)
    M = np.zeros((6, 6))
    k = 0
    for i in range(6):
        for j in range(i, 6):
            M[i, j] = M[j, i] = coef[k]
            k += 1
    return M


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--toml", required=True)
    ap.add_argument("--rate", type=float, default=1e-3)
    ap.add_argument("--n_axial", type=int, default=8)
    ap.add_argument("--workdir", default="./sweep_out")
    ap.add_argument("--shard", default=None, help="i/n host sharding")
    args = ap.parse_args()

    dirs = loading_directions(args.n_axial)
    if args.shard:
        i, n = (int(x) for x in args.shard.split("/"))
        dirs = [d for k, d in enumerate(dirs) if k % n == i]

    flow_states = []
    for k, d in enumerate(dirs):
        wd = os.path.join(args.workdir, f"load_{k:03d}")
        s = run_loading(args.toml, d, args.rate, wd)
        flow_states.append(s[-1].tolist())
        print(f"load {k}: final stress {np.round(s[-1], 6).tolist()}",
              flush=True)
    json.dump(flow_states, open(os.path.join(args.workdir,
                                             "flow_states.json"), "w"))
    if len(flow_states) >= 21 or not args.shard:
        M = fit_hill(flow_states)
        np.savetxt(os.path.join(args.workdir, "yield_surface_M.txt"), M)
        print("fitted quadratic yield surface written")


if __name__ == "__main__":
    main()
