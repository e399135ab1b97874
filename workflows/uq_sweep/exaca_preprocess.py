#!/usr/bin/env python3
"""ExaCA -> ExaConstit preprocessing (Stage3 pipeline front end).

Workflow parity with the reference's
workflows/Stage3/preprocessing/exaconstit_cli_preprocessing.py (541 LoC):
turn an ExaCA cellular-automaton microstructure CSV into the inputs a
simulation needs — per-element grain-ID file, per-grain quaternion
orientation file (deduplicated), optionally a coarsened voxel grid, an
auto-mesh-ready TOML rendered from a template, and (optionally) an MFEM
mesh via the native mesh generator.

ExaCA CSV format (header documented in the reference script):
  line 1: "Coordinates are in CA units, 1 cell = #.# microns. ..."
  line 2: "X coord, Y coord, Z coord, Grain ID"
  rows:   x, y, z, grain_id   (integers, cell-centered)
Grain IDs index ExaCA's unique-orientation list modulo its length; the
orientation file must hold passive crystal-to-sample unit quaternions
(the convention exaconstit_tpu uses directly).

Usage:
  python workflows/uq_sweep/exaca_preprocess.py exaca.csv \
      --ori-list uni_cubic_10k_quats.txt --coarsen 2 --out rve1 \
      [--toml-template master_options.toml] [--tempk 298]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def read_exaca_csv(path):
    """Returns (voxel_size_microns, grid[int32, x-fastest], dims)."""
    with open(path) as f:
        header = f.readline()
    m = re.search(r"=\s*([0-9.eE+-]+)", header)
    voxel_size = float(m.group(1)) if m else 1.0
    rows = np.loadtxt(path, delimiter=",", skiprows=2, dtype=np.int64)
    lo = rows[:, :3].min(axis=0)
    dims = rows[:, :3].max(axis=0) - lo + 1
    grid = np.zeros(dims, dtype=np.int32)
    idx = rows[:, :3] - lo
    grid[idx[:, 0], idx[:, 1], idx[:, 2]] = rows[:, 3]
    return voxel_size, grid, tuple(int(d) for d in dims)


def coarsen_grid(grid, cs):
    """Blocked majority-vote coarsening of an [x,y,z]-indexed id grid.

    Axis-order-unambiguous equivalent of the native voxel_coarsen tool
    (which mirrors the reference Rust extension's flat CA ordering, a
    layout only well-defined for cubic boxes); ties break to the
    smallest id, deterministically.
    """
    nx, ny, nz = grid.shape
    k3 = cs ** 3
    blocks = (grid.reshape(nx // cs, cs, ny // cs, cs, nz // cs, cs)
              .transpose(0, 2, 4, 1, 3, 5).reshape(-1, k3))
    s = np.sort(blocks, axis=1)
    n = s.shape[0]
    new = np.concatenate([np.ones((n, 1), bool), s[:, 1:] != s[:, :-1]],
                         axis=1)
    rid = np.cumsum(new, axis=1) - 1
    counts = np.bincount((rid + np.arange(n)[:, None] * k3).ravel(),
                         minlength=n * k3).reshape(n, k3)
    best = np.argmax(counts, axis=1)
    pos = np.argmax(rid == best[:, None], axis=1)
    out = s[np.arange(n), pos]
    return out.reshape(nx // cs, ny // cs, nz // cs)


def assign_orientations(grain_ids, ori_quats, seed=0):
    """Sequential grain numbering + per-grain unit quats.

    grain_ids: any-integer grain labels per voxel/element.  Returns
    (renumbered 1..ngrains array, (ngrains, 4) quats).  ExaCA labels
    index the unique-orientation list modulo its length; duplicated
    orientations (several grains drawing the same list entry) are
    deterministically perturbed so every grain is distinguishable, as
    the reference does.
    """
    uniq, inv = np.unique(grain_ids, return_inverse=True)
    nori = ori_quats.shape[0]
    quats = ori_quats[(np.abs(uniq) - 1) % nori].copy()
    rng = np.random.default_rng(seed)
    seen = set()
    for i in range(len(uniq)):
        key = tuple(np.round(quats[i], 12))
        while key in seen:
            # compose with a small random rotation (~1 degree) -- unlike
            # scaling one component, this moves ANY quaternion
            ax = rng.normal(size=3)
            ax /= np.linalg.norm(ax)
            half = 0.5 * np.deg2rad(rng.uniform(0.5, 2.0))
            dq = np.concatenate([[np.cos(half)], np.sin(half) * ax])
            w, x, y, z = quats[i]
            dw, dx, dy, dz = dq
            quats[i] = [w * dw - x * dx - y * dy - z * dz,
                        w * dx + x * dw + y * dz - z * dy,
                        w * dy - x * dz + y * dw + z * dx,
                        w * dz + x * dy - y * dx + z * dw]
            key = tuple(np.round(quats[i], 12))
        seen.add(key)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    return (inv + 1).astype(np.int32), quats


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("csv", help="ExaCA voxel CSV")
    ap.add_argument("--ori-list", required=True,
                    help="unique-orientation quaternion list (n x 4)")
    ap.add_argument("--coarsen", type=int, default=1,
                    help="blocked majority-vote coarsening level")
    ap.add_argument("--out", default="rve",
                    help="output base name (writes <out>_grains.txt, "
                    "<out>_ori.txt[, <out>.toml])")
    ap.add_argument("--toml-template", default=None,
                    help="TOML template with {ngrains} {ori_file} "
                    "{grain_file} {nx} {ny} {nz} {tempk} placeholders")
    ap.add_argument("--tempk", type=float, default=298.0)
    args = ap.parse_args()

    voxel_size, grid, dims = read_exaca_csv(args.csv)
    print(f"ExaCA grid {dims}, voxel {voxel_size} um")

    if args.coarsen > 1:
        if any(d % args.coarsen for d in dims):
            raise SystemExit(f"dims {dims} not divisible by "
                             f"{args.coarsen}")
        grid = coarsen_grid(grid, args.coarsen)
        dims = grid.shape
        voxel_size *= args.coarsen
        print(f"coarsened to {dims}")

    ori_quats = np.loadtxt(args.ori_list).reshape(-1, 4)
    # element order: x-fastest (the auto-mesh / mesh_generator layout)
    elems = grid.transpose(2, 1, 0).reshape(-1)
    grains, quats = assign_orientations(elems, ori_quats)

    gfile = args.out + "_grains.txt"
    ofile = args.out + "_ori.txt"
    np.savetxt(gfile, grains, fmt="%d")
    np.savetxt(ofile, quats, fmt="%.16g")
    ngrains = quats.shape[0]
    print(f"wrote {gfile} ({elems.size} elements), {ofile} "
          f"({ngrains} grains)")

    if args.toml_template:
        with open(args.toml_template) as f:
            tmpl = f.read()
        rendered = tmpl.format(ngrains=ngrains, ori_file=ofile,
                               grain_file=gfile, nx=dims[0], ny=dims[1],
                               nz=dims[2], tempk=args.tempk)
        with open(args.out + ".toml", "w") as f:
            f.write(rendered)
        print(f"wrote {args.out}.toml")


if __name__ == "__main__":
    main()
