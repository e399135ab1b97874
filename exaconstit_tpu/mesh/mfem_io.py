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
    mesh = HexMesh(coords=coords, conn=conn.astype(np.int32),
                   elem_attr=attrs, bdr_nodes=bdr_nodes, order=1)
    for _ in range(ref_levels):
        mesh = refine_hex_mesh(mesh)
    return mesh


# lexicographic local corner (i, j, k) offsets for a linear hex
_LEX = np.array([[i, j, k] for k in (0, 1) for j in (0, 1) for i in (0, 1)])


def refine_hex_mesh(mesh: HexMesh) -> HexMesh:
    """One level of uniform refinement of a linear hex mesh (1 -> 8).

    Generic-topology equivalent of MFEM's UniformRefinement as used by the
    reference for file meshes (src/mechanics_driver.cpp:307-311): new
    nodes at edge/face/cell midpoints (deduplicated across elements),
    child elements inherit the parent's attribute, and boundary-attribute
    node sets extend to any new node all of whose parent nodes carry the
    attribute.
    """
    assert mesh.order == 1, "refine before promoting the order"
    conn = np.asarray(mesh.conn)
    coords = np.asarray(mesh.coords)
    nv = coords.shape[0]
    new_nodes = {}  # frozenset(parent ids) -> new id
    new_coords = [coords]

    def node_for(ids):
        key = tuple(sorted(int(i) for i in ids))
        if len(key) == 1:
            return key[0]
        nid = new_nodes.get(key)
        if nid is None:
            nid = nv + len(new_nodes)
            new_nodes[key] = nid
            new_coords.append(coords[list(key)].mean(axis=0, keepdims=True))
        return nid

    ne = conn.shape[0]
    fine_conn = np.empty((8 * ne, 8), dtype=np.int64)
    fine_attr = np.empty(8 * ne, dtype=np.int32)

    def corner(e, i, j, k):
        # parent corner ids participating in the fine (i,j,k)/2 position
        ids = set()
        for di in ((0, 1) if i == 1 else (i // 2,)):
            for dj in ((0, 1) if j == 1 else (j // 2,)):
                for dk in ((0, 1) if k == 1 else (k // 2,)):
                    loc = di + 2 * dj + 4 * dk
                    ids.add(int(conn[e, loc]))
        return node_for(ids)

    c = 0
    for e in range(ne):
        for ck in (0, 1):
            for cj in (0, 1):
                for ci in (0, 1):
                    fine_conn[c] = [corner(e, ci + o[0], cj + o[1],
                                           ck + o[2]) for o in _LEX]
                    fine_attr[c] = mesh.elem_attr[e]
                    c += 1
    all_coords = np.concatenate(new_coords, axis=0)

    bdr_nodes = {}
    for attr, ids in mesh.bdr_nodes.items():
        s = set(int(i) for i in np.asarray(ids))
        extra = [nid for key, nid in new_nodes.items()
                 if all(p in s for p in key)]
        bdr_nodes[attr] = np.array(sorted(s | set(extra)), dtype=np.int64)

    return HexMesh(coords=all_coords, conn=fine_conn.astype(np.int32),
                   elem_attr=fine_attr, bdr_nodes=bdr_nodes, order=1)
