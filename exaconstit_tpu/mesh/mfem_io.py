"""MFEM v1.0 mesh file reader (linear hexahedra).

Covers the reference's `Mesh.type = "cubit"`/`"other"` paths
(src/mechanics_driver.cpp:239-241) for conforming all-hex meshes with
element attributes (grain ids) and boundary quads with attributes, e.g.
the output of the reference's scripts/meshing/mesh_generator.cpp.
"""

from __future__ import annotations

import numpy as np

from .voxel import HexMesh

# MFEM local vertex numbering for hexes: bottom quad CCW, then top quad.
# Our lexicographic order-1 local ordering is
# (0,0,0),(1,0,0),(0,1,0),(1,1,0),(0,0,1),(1,0,1),(0,1,1),(1,1,1)
# MFEM hex vertices:
# 0:(0,0,0) 1:(1,0,0) 2:(1,1,0) 3:(0,1,0) 4:(0,0,1) 5:(1,0,1) 6:(1,1,1) 7:(0,1,1)
_MFEM_TO_LEX = np.array([0, 1, 3, 2, 4, 5, 7, 6])


def read_mfem_mesh(path: str, ref_levels: int = 0) -> HexMesh:
    if ref_levels > 0:
        raise NotImplementedError(
            "uniform refinement of file meshes is not implemented yet; "
            "use the auto mesh or pre-refined files")
    with open(path) as f:
        lines = [ln.strip() for ln in f]
    i = 0

    def seek(tag):
        nonlocal i
        while i < len(lines) and lines[i] != tag:
            i += 1
        if i >= len(lines):
            raise ValueError(f"section {tag} not found in {path}")
        i += 1

    seek("dimension")
    dim = int(lines[i]); i += 1
    assert dim == 3, "only 3D meshes supported"

    seek("elements")
    ne = int(lines[i]); i += 1
    attrs = np.empty(ne, dtype=np.int32)
    conn = np.empty((ne, 8), dtype=np.int64)
    for e in range(ne):
        parts = lines[i].split(); i += 1
        attrs[e] = int(parts[0])
        assert int(parts[1]) == 5, "only hexahedra supported"  # geom type 5
        verts = np.array([int(p) for p in parts[2:10]])
        conn[e] = verts[np.argsort(_MFEM_TO_LEX)]  # reorder to lex local

    seek("boundary")
    nb = int(lines[i]); i += 1
    bdr = {}
    for b in range(nb):
        parts = lines[i].split(); i += 1
        attr = int(parts[0])
        # geom type 3 = quad
        verts = [int(p) for p in parts[2:6]]
        bdr.setdefault(attr, set()).update(verts)

    seek("vertices")
    nv = int(lines[i]); i += 1
    vdim_line = lines[i]
    if len(vdim_line.split()) == 1:
        i += 1  # vdim on its own line
    coords = np.empty((nv, 3))
    for v in range(nv):
        coords[v] = [float(x) for x in lines[i].split()[:3]]
        i += 1

    bdr_nodes = {a: np.array(sorted(s), dtype=np.int64)
                 for a, s in bdr.items()}
    return HexMesh(coords=coords, conn=conn.astype(np.int32),
                   elem_attr=attrs, bdr_nodes=bdr_nodes, order=1)
