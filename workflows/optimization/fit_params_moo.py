#!/usr/bin/env python3
"""Multi-objective (U-NSGA-III) crystal-plasticity parameter fitting.

Parity with the reference's full optimization workflow
(/root/reference/workflows/optimization/ExaConstit_NSGA3.py +
ExaConstit_Problems.py): fit CP parameters against ONE OR MORE
experimental stress-strain curves, with TWO objectives per experiment —
the normalized stress RMSD and the normalized stress-slope RMSD
(ExaConstit_Problems.py postprocess; NOBJ = 2 * NEXP) — solved by the
from-scratch U-NSGA-III in nsga3.py (DEAP is not available here).

Differences from the reference, by design:
* simulations run in-process through exaconstit_tpu.driver.Simulation
  instead of shelling out to `mpirun mechanics` — one TPU chip runs a
  candidate orders of magnitude faster than the reference's 2-rank CPU
  jobs, and the in-process path needs no Flux/EnTK scheduler;
* the ensemble axis (independent candidates) shards across processes
  with --shard i/n (the analog of the reference's flux_map.py job map);
  each shard evaluates its slice of the population and writes
  objectives to a shared directory, so a cluster launcher (or one
  host) can fan the population out;
* GA state pickles every generation (like the reference's checkpoint
  pickles, workflows/README.md:16) so --restart resumes mid-run.

Parameters are selected by their index in the props file:
  --params 9:0.2,0.8 10:0.01,0.03
means optimize props[9] in [0.2, 0.8] and props[10] in [0.01, 0.03],
shared across experiments (the reference's "independent" group).
Per-experiment ("dependent") parameters append @k to the index:
  --params 9@0:0.2,0.8 9@1:0.2,0.8
optimizes props[9] separately for experiment 0 and 1.

Example (two experiments, four objectives):
  python fit_params_moo.py --toml caseA.toml caseB.toml \
      --exp expA.txt expB.txt --params 9:0.1,0.4 10:0.005,0.02 \
      --pop 16 --gens 12 --out fitdir
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import nsga3  # noqa: E402


def parse_param_spec(specs):
    """[(prop_index, exp_index_or_None, low, high)] from CLI specs."""
    out = []
    for s in specs:
        loc, rng = s.split(":")
        if "@" in loc:
            idx, exp = loc.split("@")
            exp = int(exp)
        else:
            idx, exp = loc, None
        lo, hi = (float(v) for v in rng.split(","))
        out.append((int(idx), exp, lo, hi))
    return out


def run_candidate(toml_path, prop_updates, workdir):
    from exaconstit_tpu.driver import Simulation, parse_options

    opt = parse_options(toml_path)
    props = np.loadtxt(opt.abspath(opt.props_file)).reshape(-1)
    for idx, val in prop_updates:
        props[idx] = val
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
        t = np.cumsum(np.asarray(sim.cust_dt[:len(s)]))
    else:
        t = np.arange(1, len(s) + 1) * opt.dt
    return t, s[:, 2]


def objectives_for_curve(t_sim, s_sim, exp):
    """(stress NRMSD, slope NRMSD) vs experiment rows (strain, stress).

    Mirrors ExaConstit_Problems.postprocess: RMSD normalized by the
    experimental standard deviation, plus the same for d(stress)/d
    (strain); simulation sampled onto the experimental strain grid.
    """
    e_exp, s_exp = exp[:, 0], exp[:, 1]
    # simulated strain from time * rate is the caller's mapping; here the
    # sim curve is parameterized by its own strain column = t_sim
    s_i = np.interp(e_exp, t_sim, s_sim)
    f_stress = (np.sqrt(np.mean((s_i - s_exp) ** 2))
                / max(np.std(s_exp), 1e-30))
    de = np.diff(e_exp)
    de = np.where(np.abs(de) < 1e-30, 1e-30, de)
    slope_exp = np.diff(s_exp) / de
    slope_sim = np.diff(s_i) / de
    f_slope = (np.sqrt(np.mean((slope_sim - slope_exp) ** 2))
               / max(np.std(slope_exp), 1e-30))
    return f_stress, f_slope


class ExaProbMOO:
    """Batch evaluator: population (pop, ndim) -> objectives (pop, nobj)."""

    def __init__(self, tomls, exps, spec, out_dir, strain_rates,
                 shard=(0, 1)):
        self.tomls = tomls
        self.exps = [np.atleast_2d(np.loadtxt(e)) for e in exps]
        self.spec = spec
        self.out = out_dir
        self.rates = strain_rates
        self.shard = shard
        self.gen = 0

    def __call__(self, X):
        pop = len(X)
        F = np.zeros((pop, 2 * len(self.tomls)))
        i0, nsh = self.shard
        for g, x in enumerate(X):
            if g % nsh != i0:
                continue
            for k, (toml, exp) in enumerate(zip(self.tomls, self.exps)):
                updates = [(idx, x[j]) for j, (idx, e, _, _)
                           in enumerate(self.spec) if e in (None, k)]
                wdir = os.path.join(self.out, f"gen_{self.gen}",
                                    f"gene_{g}_obj_{k}")
                try:
                    t, s = run_candidate(toml, updates, wdir)
                    strain = t * self.rates[k]
                    F[g, 2 * k:2 * k + 2] = objectives_for_curve(
                        strain, s, exp)
                except Exception as err:  # failed candidate -> penalized
                    print(f"  gene {g} obj {k} FAILED: {err}", flush=True)
                    F[g, 2 * k:2 * k + 2] = 1e3
        if nsh > 1:
            # merge shards through the filesystem (flux_map analog)
            me = os.path.join(self.out, f"gen_{self.gen}_shard{i0}.npy")
            np.save(me, F)
            for j in range(nsh):
                other = os.path.join(self.out,
                                     f"gen_{self.gen}_shard{j}.npy")
                import time
                while not os.path.exists(other):
                    time.sleep(2.0)
                Fo = np.load(other)
                mask = (np.arange(pop) % nsh) == j
                F[mask] = Fo[mask]
        self.gen += 1
        return F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--toml", nargs="+", required=True)
    ap.add_argument("--exp", nargs="+", required=True,
                    help="experimental files, rows: strain stress")
    ap.add_argument("--params", nargs="+", required=True)
    ap.add_argument("--rate", nargs="+", type=float, default=None,
                    help="strain rate per experiment (strain = t * rate); "
                         "default 1e-3")
    ap.add_argument("--pop", type=int, default=16)
    ap.add_argument("--gens", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="fit_moo")
    ap.add_argument("--shard", default="0/1")
    ap.add_argument("--restart", action="store_true")
    args = ap.parse_args()

    spec = parse_param_spec(args.params)
    rates = args.rate or [1e-3] * len(args.toml)
    assert len(args.toml) == len(args.exp) == len(rates)
    os.makedirs(args.out, exist_ok=True)
    shard = tuple(int(v) for v in args.shard.split("/"))

    prob = ExaProbMOO(args.toml, args.exp, spec, args.out, rates,
                      shard=shard)
    ckpt = os.path.join(args.out, "ga_checkpoint.pkl")
    x0 = None
    if args.restart and os.path.exists(ckpt):
        with open(ckpt, "rb") as f:
            st = pickle.load(f)
        x0, prob.gen = st["X"], st["gen"]
        print(f"restarting from gen {prob.gen}")

    def save(gen, X, F):
        with open(ckpt, "wb") as f:
            pickle.dump({"X": X, "F": F, "gen": prob.gen}, f)
        print(f"gen {gen}: best-sum {F.sum(axis=1).min():.5f} "
              f"min-per-obj {F.min(axis=0)}", flush=True)

    res = nsga3.optimize(
        prob, [s[2] for s in spec], [s[3] for s in spec],
        n_obj=2 * len(args.toml), pop_size=args.pop, n_gen=args.gens,
        seed=args.seed, callback=save, x0=x0)

    np.savetxt(os.path.join(args.out, "pareto_x.txt"), res.front_x)
    np.savetxt(os.path.join(args.out, "pareto_f.txt"), res.front_f)
    print("pareto front size:", len(res.front_x))
    print("best (sum):", res.front_x[np.argmin(res.front_f.sum(axis=1))])


if __name__ == "__main__":
    main()
