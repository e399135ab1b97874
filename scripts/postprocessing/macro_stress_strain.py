#!/usr/bin/env python3
"""Macroscopic stress-strain curve extraction / plotting.

Tooling parity with the reference's
scripts/postprocessing/macro_stress_strain_plot.py: reads the appended
volume-averaged stress file plus the time-step schedule and produces the
engineering stress-strain curve for a chosen component.
"""

import argparse

import numpy as np


def load_curve(stress_file, dt_file=None, dt=None, strain_rate=1e-3,
               comp=2):
    s = np.atleast_2d(np.loadtxt(stress_file))
    n = len(s)
    if dt_file:
        dts = np.loadtxt(dt_file).reshape(-1)[:n]
    else:
        dts = np.full(n, dt if dt else 1.0)
    t = np.cumsum(dts)
    strain = strain_rate * t
    return strain, s[:, comp]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("stress_file")
    ap.add_argument("--dt_file", default=None)
    ap.add_argument("--dt", type=float, default=None)
    ap.add_argument("--strain_rate", type=float, default=1e-3)
    ap.add_argument("--comp", type=int, default=2,
                    help="svec component (0=xx..2=zz,3=yz,4=xz,5=xy)")
    ap.add_argument("--csv", default=None, help="write strain,stress csv")
    ap.add_argument("--plot", default=None, help="write plot png")
    args = ap.parse_args()
    strain, stress = load_curve(args.stress_file, args.dt_file, args.dt,
                                args.strain_rate, args.comp)
    if args.csv:
        np.savetxt(args.csv, np.column_stack([strain, stress]),
                   delimiter=",", header="strain,stress")
        print("wrote", args.csv)
    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.plot(strain * 100, stress * 1e3)
        plt.xlabel("engineering strain (%)")
        plt.ylabel("stress (MPa)")
        plt.tight_layout()
        plt.savefig(args.plot, dpi=150)
        print("wrote", args.plot)
    if not args.csv and not args.plot:
        for e, s in zip(strain, stress):
            print(f"{e:.6e} {s:.6e}")


if __name__ == "__main__":
    main()
