#!/usr/bin/env python3
"""Convert an FEpX mesh (``.mesh``/``.grain``/``.kocks``) to a VTK
unstructured grid of quadratic tetrahedra with per-element grain data.

Functional equivalent of the reference's
``scripts/meshing/fepx2mfem_mesh.py`` (146 LoC hard-coded script); this
version is a CLI.  The emitted legacy-VTK file can be consumed by MFEM's
VTK reader (the reference's downstream path) or any VTK tool; the
optional ``--ori-file`` output converts the per-grain Kocks angles to
the passive unit quaternions exaconstit_tpu reads via
``Properties.grain.ori_*`` (ori_type = quats).

FEpX file conventions (fepx.readthedocs.io, "mesh file format"):
  * ``<base>.mesh``  — node lines ``id x y z`` (4 fields), surface-node
    lines (7 fields), and 10-node tetrahedral element lines
    ``id n0 .. n9`` (11 fields).
  * ``<base>.grain`` — one header line, then ``grain phase`` per element.
  * ``<base>.kocks`` — two header lines, then ``psi theta phi`` (Kocks
    convention, degrees) per grain, optionally a trailing footer line.

FEpX orders the 10-node tet as corners at local 0,2,4,9 with mid-edge
nodes interleaved (0-1-2-3-4-5 around the base triangle, 6,7,8 rising to
the apex); VTK's quadratic tet (cell type 24) wants the 4 corners first
then the 6 mid-edges in (01,12,20,03,13,23) order, which maps to FEpX
locals [0,2,4,9,1,3,5,6,7,8].
"""

import argparse
import sys

import numpy as np

# FEpX 10-node tet local ordering -> VTK_QUADRATIC_TETRA (type 24)
FEPX_TO_VTK_TET10 = (0, 2, 4, 9, 1, 3, 5, 6, 7, 8)
VTK_QUADRATIC_TETRA = 24


def read_fepx(base):
    """Parse ``base{.mesh,.grain,.kocks}``.

    Returns dict with ``crd`` (nnodes,3) f64, ``conn`` (nelems,10) i64
    (0-based, FEpX local order), ``surface_nodes`` (raw 7-field rows),
    ``grains``/``phases`` (nelems,) i64, ``kocks`` (ngrains,3) f64 deg.
    """
    crd, conn, surf = [], [], []
    with open(base + ".mesh") as f:
        for line in f:
            w = line.split()
            if len(w) == 4:
                crd.append([float(x) for x in w[1:4]])
            elif len(w) == 7:
                surf.append([float(x) for x in w])
            elif len(w) == 11:
                conn.append([int(float(x)) for x in w[1:11]])
    crd = np.asarray(crd, dtype=np.float64)
    conn = np.asarray(conn, dtype=np.int64)
    if conn.size and conn.min() == 1:   # FEpX is 1-based
        conn = conn - 1

    body = np.atleast_2d(np.genfromtxt(base + ".grain", skip_header=1))
    grains = body[:, 0].astype(np.int64)
    phases = (body[:, 1].astype(np.int64) if body.shape[1] > 1
              else np.ones_like(grains))

    ngrains = len(np.unique(grains))
    kocks = np.atleast_2d(
        np.genfromtxt(base + ".kocks", usecols=(0, 1, 2), skip_header=2,
                      skip_footer=1, invalid_raise=False))
    if kocks.shape[0] != ngrains:       # no footer line variant
        kocks = np.atleast_2d(
            np.genfromtxt(base + ".kocks", usecols=(0, 1, 2),
                          skip_header=2))
    return {"crd": crd, "conn": conn, "surface_nodes": np.asarray(surf),
            "grains": grains, "phases": phases, "kocks": kocks}


def kocks_to_quat(kocks_deg):
    """Kocks angles (psi, theta, phi), degrees -> passive unit quats.

    Kocks convention: the sample->crystal rotation is
    R = Rz(phi + pi/2) Rx(theta)... expressed via the standard Bunge
    relation psi1 = psi + pi/2, Phi = theta, psi2 = pi/2 - phi.  We go
    through the Bunge ZXZ factorization and return (w, x, y, z) rows.
    """
    k = np.deg2rad(np.atleast_2d(kocks_deg))
    psi1 = k[:, 0] + np.pi / 2.0
    cap = k[:, 1]
    psi2 = np.pi / 2.0 - k[:, 2]
    # ZXZ Euler -> quaternion, closed form for R = Rz(psi2) Rx(cap) Rz(psi1)
    c, s = np.cos(cap / 2), np.sin(cap / 2)
    w = c * np.cos((psi1 + psi2) / 2.0)
    x = s * np.cos((psi1 - psi2) / 2.0)
    y = s * np.sin((psi1 - psi2) / 2.0)
    z = c * np.sin((psi1 + psi2) / 2.0)
    quat = np.stack([w, x, y, z], axis=1)
    # normalize + canonical sign (w >= 0)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    quat[quat[:, 0] < 0] *= -1.0
    return quat


def write_vtk(path, crd, conn_vtk, grains, phases=None, title="fepx mesh"):
    """Legacy ASCII VTK unstructured grid of quadratic tets."""
    nelems, npe = conn_vtk.shape
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\n%s\nASCII\n"
                "DATASET UNSTRUCTURED_GRID\n" % title)
        f.write("POINTS %d double\n" % len(crd))
        np.savetxt(f, crd, fmt="%.16g")
        f.write("CELLS %d %d\n" % (nelems, nelems * (npe + 1)))
        np.savetxt(f, np.column_stack(
            [np.full(nelems, npe, dtype=np.int64), conn_vtk]), fmt="%d")
        f.write("CELL_TYPES %d\n" % nelems)
        np.savetxt(f, np.full(nelems, VTK_QUADRATIC_TETRA, np.int64),
                   fmt="%d")
        f.write("CELL_DATA %d\nSCALARS material int\n"
                "LOOKUP_TABLE default\n" % nelems)
        np.savetxt(f, grains, fmt="%d")
        if phases is not None:
            f.write("SCALARS phase int\nLOOKUP_TABLE default\n")
            np.savetxt(f, phases, fmt="%d")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("base", help="FEpX file base (expects base.mesh, "
                    "base.grain, base.kocks)")
    ap.add_argument("-o", "--out", default=None,
                    help="output VTK path (default <base>.vtk)")
    ap.add_argument("--ori-file", default=None,
                    help="also write per-grain passive quaternions "
                    "(w x y z per line) converted from the Kocks angles")
    ap.add_argument("--grain-file", default=None,
                    help="also write the per-element grain-id file")
    args = ap.parse_args(argv)

    mesh = read_fepx(args.base)
    conn_vtk = mesh["conn"][:, FEPX_TO_VTK_TET10]
    out = args.out or (args.base + ".vtk")
    write_vtk(out, mesh["crd"], conn_vtk, mesh["grains"], mesh["phases"])
    print("wrote %s: %d nodes, %d quadratic tets, %d grains"
          % (out, len(mesh["crd"]), len(conn_vtk),
             len(np.unique(mesh["grains"]))))
    if args.ori_file:
        np.savetxt(args.ori_file, kocks_to_quat(mesh["kocks"]),
                   fmt="%.16g")
        print("wrote %s" % args.ori_file)
    if args.grain_file:
        np.savetxt(args.grain_file, mesh["grains"], fmt="%d")
        print("wrote %s" % args.grain_file)
    return 0


if __name__ == "__main__":
    sys.exit(main())
