#!/usr/bin/env python3
"""Convert a Neper v4 gmsh v2.2 mesh (with -faset surface sets) to an
MFEM v1.0 mesh + grain-map file usable by exaconstit_tpu.

Functional equivalent of the reference's scripts/meshing/neper_v4_mesh.py
(which rewrites the gmsh file for MFEM's gmsh reader); here we emit MFEM
v1.0 directly, which both this framework (exaconstit_tpu.mesh.mfem_io)
and MFEM itself read, plus the per-element grain-id file.

Typical Neper invocation (hexahedral mesh of a tessellation):
    neper -T -n 50 -o n50
    neper -M n50.tess -elttype hex -faset 'faces' -format msh -o n50

Then:
    python neper_v4_mesh.py -ifile n50.msh -ofile n50.mesh \
        [--exaconstit-attrs] [--grain-file n50_grains.txt]

--exaconstit-attrs maps the Neper domain-face faset names
(x0,x1,y0,y1,z0,z1) to the ExaConstit auto-mesh boundary convention
(1=z0, 2=x0, 3=y0, 4=z1, 5=x1, 6=y1 — mechanics_driver.cpp:1196-1231);
otherwise fasets get attributes 1..n in file order.
"""

import argparse
import sys

EXACONSTIT_FACE_ATTRS = {"z0": 1, "x0": 2, "y0": 3, "z1": 4, "x1": 5,
                         "y1": 6}
# gmsh 2D element type -> number of corner nodes
_SURF_TYPES = {2: 3, 3: 4, 9: 3, 16: 4}  # tri, quad, tri6, quad8


def parse_gmsh(path):
    """Returns (nodes {id: (x,y,z)}, hexes [(grain, [8 ids])],
    fasets {name: [[corner ids]]})."""
    nodes, hexes, fasets = {}, [], {}
    section = None
    count = 0
    faset_name = None
    with open(path) as f:
        it = iter(f)
        for line in it:
            s = line.strip()
            if s.startswith("$End"):
                section = None
                continue
            if s.startswith("$"):
                section = s[1:]
                count = -1
                continue
            if section == "Nodes":
                if count < 0:
                    count = int(s)
                    continue
                p = s.split()
                nodes[int(p[0])] = (float(p[1]), float(p[2]), float(p[3]))
            elif section == "Elements":
                if count < 0:
                    count = int(s)
                    continue
                p = s.split()
                etype, ntags = int(p[1]), int(p[2])
                if etype in (5, 12, 17):  # hex8 / hex27 / hex20
                    tags = [int(t) for t in p[3:3 + ntags]]
                    grain = tags[0] if tags else 1
                    verts = [int(v) for v in p[3 + ntags:3 + ntags + 8]]
                    hexes.append((grain, verts))
            elif section == "Fasets":
                if count < 0:
                    count = int(s)
                    faset_name = None
                    continue
                p = s.split()
                if len(p) == 1 and not p[0].lstrip("-").isdigit():
                    faset_name = p[0]
                    fasets[faset_name] = []
                    continue
                if faset_name is not None and len(p) == 1:
                    continue  # per-faset element count line
                if faset_name is not None:
                    nv = len(p) - 1
                    take = 3 if nv in (3, 6) else 4
                    fasets[faset_name].append([int(v) for v in p[1:1 + take]])
    return nodes, hexes, fasets


def write_mfem(path, nodes, hexes, fasets, attr_map):
    ids = sorted(nodes)
    remap = {nid: k for k, nid in enumerate(ids)}
    with open(path, "w") as f:
        f.write("MFEM mesh v1.0\n\ndimension\n3\n\n")
        f.write(f"elements\n{len(hexes)}\n")
        for grain, verts in hexes:
            v = " ".join(str(remap[x]) for x in verts)
            f.write(f"{grain} 5 {v}\n")
        nbdr = sum(len(v) for v in fasets.values())
        f.write(f"\nboundary\n{nbdr}\n")
        for name, faces in fasets.items():
            attr = attr_map[name]
            for face in faces:
                if len(face) == 3:
                    v = " ".join(str(remap[x]) for x in face)
                    f.write(f"{attr} 2 {v}\n")  # triangle
                else:
                    v = " ".join(str(remap[x]) for x in face)
                    f.write(f"{attr} 3 {v}\n")  # quad
        f.write(f"\nvertices\n{len(ids)}\n3\n")
        for nid in ids:
            x, y, z = nodes[nid]
            f.write(f"{x:.16g} {y:.16g} {z:.16g}\n")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-ifile", "--input_filename", required=True)
    ap.add_argument("-ofile", "--output_filename", required=True)
    ap.add_argument("--grain-file", default=None,
                    help="also write the per-element grain-id map here")
    ap.add_argument("--exaconstit-attrs", action="store_true",
                    help="map fasets named x0..z1 to the ExaConstit "
                    "auto-mesh boundary attribute convention")
    args = ap.parse_args(argv)

    nodes, hexes, fasets = parse_gmsh(args.input_filename)
    if not hexes:
        sys.exit("no hexahedral elements found (Neper: use -elttype hex)")
    if args.exaconstit_attrs:
        unknown = [n for n in fasets if n not in EXACONSTIT_FACE_ATTRS]
        if unknown:
            sys.exit(f"fasets {unknown} are not domain faces x0..z1; "
                     "drop --exaconstit-attrs")
        attr_map = {n: EXACONSTIT_FACE_ATTRS[n] for n in fasets}
    else:
        attr_map = {n: k + 1 for k, n in enumerate(fasets)}

    write_mfem(args.output_filename, nodes, hexes, fasets, attr_map)
    if args.grain_file:
        with open(args.grain_file, "w") as f:
            for grain, _ in hexes:
                f.write(f"{grain}\n")
    print(f"{len(hexes)} hexes, {len(nodes)} nodes, "
          f"{sum(len(v) for v in fasets.values())} boundary faces, "
          f"fasets: {attr_map}")


if __name__ == "__main__":
    main()
