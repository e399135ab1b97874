#!/usr/bin/env python3
"""Extract per-element fields from an exaconstit_tpu HDF5 data collection
into per-step text files.

Equivalent of the reference's scripts/postprocessing/adios2_extraction.py
(which reads the ADIOS2 .bp data collection): writes
``raw_<Field>_<step>.txt`` files — the input format the downstream
strain_Xtal_to_Sample.py / calc_lattice_strain.py scripts consume.

Usage:
    python extract_fields.py run.h5 outdir [--fields LatticeOrientation
        XtalElasticStrain ElementVolume ...]
"""

import argparse
import os


def main(argv=None):
    import h5py
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("h5file")
    ap.add_argument("outdir")
    ap.add_argument("--fields", nargs="+",
                    default=["LatticeOrientation", "XtalElasticStrain",
                             "ElementVolume", "ElemCentroid"])
    args = ap.parse_args(argv)
    os.makedirs(args.outdir, exist_ok=True)

    with h5py.File(args.h5file, "r") as f:
        cycles = sorted(f["cycles"])
        for k, cyc in enumerate(cycles):
            fields = f[f"cycles/{cyc}/fields"]
            for name in args.fields:
                if name not in fields:
                    continue
                data = np.asarray(fields[name]["values"])
                np.savetxt(os.path.join(args.outdir,
                                        f"raw_{name}_{k:02d}.txt"), data)
    print(f"extracted {len(cycles)} steps -> {args.outdir}")


if __name__ == "__main__":
    main()
