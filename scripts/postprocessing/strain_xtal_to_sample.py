#!/usr/bin/env python3
"""Rotate per-element elastic strain from the crystal to the sample frame.

Equivalent of the reference's scripts/postprocessing/strain_Xtal_to_Sample.py
without the HEXRD dependency.  Reads ``raw_LatticeOrientation_NN.txt`` and
``raw_XtalElasticStrain_NN.txt`` (from extract_fields.py), writes
``SampleElasticStrain_NN.txt`` with rows [e11 e22 e33 e23 e13 e12]
(tensor shear components, no factors of 2 — same as the reference).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from xtal_util import rmat_of_quat  # noqa: E402


def convert_step(quats, strain_v):
    R = rmat_of_quat(quats)  # crystal -> sample
    e = strain_v
    T = np.empty(e.shape[:1] + (3, 3))
    T[:, 0, 0], T[:, 1, 1], T[:, 2, 2] = e[:, 0], e[:, 1], e[:, 2]
    T[:, 1, 2] = T[:, 2, 1] = e[:, 3]
    T[:, 0, 2] = T[:, 2, 0] = e[:, 4]
    T[:, 0, 1] = T[:, 1, 0] = e[:, 5]
    Ts = np.einsum("nij,njk,nlk->nil", R, T, R)
    return np.stack([Ts[:, 0, 0], Ts[:, 1, 1], Ts[:, 2, 2], Ts[:, 1, 2],
                     Ts[:, 0, 2], Ts[:, 0, 1]], axis=1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("indir", help="dir with raw_* files (extract_fields.py)")
    ap.add_argument("outdir")
    args = ap.parse_args(argv)
    os.makedirs(args.outdir, exist_ok=True)

    steps = sorted(f.split("_")[-1][:-4] for f in os.listdir(args.indir)
                   if f.startswith("raw_LatticeOrientation"))
    for s in steps:
        quats = np.atleast_2d(
            np.loadtxt(os.path.join(args.indir,
                                    f"raw_LatticeOrientation_{s}.txt")))
        strain = np.atleast_2d(
            np.loadtxt(os.path.join(args.indir,
                                    f"raw_XtalElasticStrain_{s}.txt")))
        out = convert_step(quats, strain)
        np.savetxt(os.path.join(args.outdir, f"SampleElasticStrain_{s}.txt"),
                   out)
    print(f"converted {len(steps)} steps -> {args.outdir}")


if __name__ == "__main__":
    main()
