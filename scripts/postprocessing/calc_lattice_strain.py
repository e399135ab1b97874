#!/usr/bin/env python3
"""Calculate lattice strains (simulated diffraction) from a run's
light_up outputs.

Equivalent of the reference's scripts/postprocessing/calc_lattice_strain.py
without the HEXRD dependency: for each requested (hkl) the elements whose
orientation lies within an angular bound of the crystallographic fiber
{(hkl) || s_dir} are selected, and the volume-weighted average of the
elastic strain projected along s_dir is reported per step — the quantity
a powder/HEDM diffraction experiment measures for that reflection.

Inputs: the per-step raw_* files from extract_fields.py and the
SampleElasticStrain files from strain_xtal_to_sample.py (run it first),
or pass --h5 <run.h5> to run the whole chain from an HDF5 data
collection in one go.

Output: lattice_strains.txt, rows = steps, cols = hkl list.
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from xtal_util import (cubic_symmetries, distance_to_fiber,  # noqa: E402
                       hex_symmetries, hkl_to_cartesian)


def lattice_strains(raw_dir, strain_dir, hkls, s_dir, distance_deg=5.0,
                    lattice="cubic", lparms=(1.0,)):
    qsym = cubic_symmetries() if lattice == "cubic" else hex_symmetries()
    s_dir = np.asarray(s_dir, dtype=float)
    steps = sorted(f.split("_")[-1][:-4] for f in os.listdir(raw_dir)
                   if f.startswith("raw_LatticeOrientation"))
    # strain projection along s without tensor conversion (svec with
    # tensor shears, ordering [11 22 33 23 13 12])
    s = s_dir / np.linalg.norm(s_dir)
    project = np.array([s[0] ** 2, s[1] ** 2, s[2] ** 2, 2 * s[1] * s[2],
                        2 * s[0] * s[2], 2 * s[0] * s[1]])
    out = np.zeros((len(steps), len(hkls)))
    counts = np.zeros((len(steps), len(hkls)), dtype=int)
    for i, st in enumerate(steps):
        quats = np.atleast_2d(np.loadtxt(
            os.path.join(raw_dir, f"raw_LatticeOrientation_{st}.txt")))
        vols = np.atleast_1d(np.loadtxt(
            os.path.join(raw_dir, f"raw_ElementVolume_{st}.txt")))
        strain = np.atleast_2d(np.loadtxt(
            os.path.join(strain_dir, f"SampleElasticStrain_{st}.txt")))
        for j, hkl in enumerate(hkls):
            c_dir = hkl_to_cartesian(hkl, lattice, lparms)
            dist = np.degrees(distance_to_fiber(c_dir, s, quats, qsym))
            sel = dist < distance_deg
            counts[i, j] = sel.sum()
            if sel.any():
                out[i, j] = np.average(strain[sel] @ project,
                                       weights=vols[sel])
    return out, counts, steps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw-dir", help="dir with raw_* files")
    ap.add_argument("--strain-dir", help="dir with SampleElasticStrain_*")
    ap.add_argument("--h5", help="run the full chain from an HDF5 data "
                    "collection (overrides --raw-dir/--strain-dir)")
    ap.add_argument("--out", default="lattice_strains.txt")
    ap.add_argument("--hkl", nargs="+", default=["111", "200", "220", "311"],
                    help="Miller indices, e.g. 111 200 220 311")
    ap.add_argument("--sdir", nargs=3, type=float, default=[0, 0, 1])
    ap.add_argument("--distance", type=float, default=5.0,
                    help="max fiber distance in degrees")
    ap.add_argument("--lattice", choices=["cubic", "hexagonal"],
                    default="cubic")
    ap.add_argument("--lparms", nargs="+", type=float, default=[1.0])
    args = ap.parse_args(argv)

    raw_dir, strain_dir = args.raw_dir, args.strain_dir
    if args.h5:
        import extract_fields
        import strain_xtal_to_sample
        tmp = tempfile.mkdtemp()
        raw_dir = os.path.join(tmp, "raw")
        strain_dir = os.path.join(tmp, "strain")
        extract_fields.main([args.h5, raw_dir])
        strain_xtal_to_sample.main([raw_dir, strain_dir])
    if not raw_dir or not strain_dir:
        ap.error("give --h5 or both --raw-dir and --strain-dir")

    hkls = [[int(c) for c in h] if h.isdigit() else
            [int(v) for v in h.split(",")] for h in args.hkl]
    out, counts, steps = lattice_strains(
        raw_dir, strain_dir, hkls, args.sdir, args.distance, args.lattice,
        tuple(args.lparms))
    np.savetxt(args.out, out)
    for j, h in enumerate(args.hkl):
        print(f"hkl {h}: {counts[:, j].min()}-{counts[:, j].max()} elements"
              " in fiber")
    print(f"{len(steps)} steps x {len(hkls)} reflections -> {args.out}")


if __name__ == "__main__":
    main()
