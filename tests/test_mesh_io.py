"""Mesh IO tests: MFEM reader + uniform refinement + Neper converter."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

UNIT_HEX_MESH = """MFEM mesh v1.0

dimension
3

elements
1
7 5 0 1 2 3 4 5 6 7

boundary
6
1 3 0 3 2 1
4 3 4 5 6 7
2 3 0 4 7 3
5 3 1 2 6 5
3 3 0 1 5 4
6 3 3 7 6 2

vertices
8
3
0 0 0
1 0 0
1 1 0
0 1 0
0 0 1
1 0 1
1 1 1
0 1 1
"""


def test_read_and_refine_unit_hex(tmp_path):
    from exaconstit_tpu.mesh.mfem_io import read_mfem_mesh
    from exaconstit_tpu.mesh.voxel import make_cartesian_mesh

    p = tmp_path / "unit.mesh"
    p.write_text(UNIT_HEX_MESH)
    m0 = read_mfem_mesh(str(p))
    assert m0.num_elems == 1 and m0.num_nodes == 8
    assert m0.elem_attr[0] == 7

    m1 = read_mfem_mesh(str(p), ref_levels=1)
    assert m1.num_elems == 8 and m1.num_nodes == 27
    assert (m1.elem_attr == 7).all()
    # volume preserved
    ref = make_cartesian_mesh([1, 1, 1], [1.0, 1.0, 1.0], ref_levels=1)
    got = np.array(sorted(map(tuple, m1.coords)))
    want = np.array(sorted(map(tuple, ref.coords)))
    np.testing.assert_allclose(got, want, atol=1e-14)
    # boundary sets: every face of the refined cube has 9 nodes, and the
    # node coordinates match the voxel generator's convention per attr
    for attr in range(1, 7):
        assert len(m1.bdr_nodes[attr]) == 9
        got_f = np.array(sorted(map(tuple, m1.coords[m1.bdr_nodes[attr]])))
        want_f = np.array(sorted(map(tuple,
                                     ref.coords[ref.bdr_nodes[attr]])))
        np.testing.assert_allclose(got_f, want_f, atol=1e-14)

    m2 = read_mfem_mesh(str(p), ref_levels=2)
    assert m2.num_elems == 64 and m2.num_nodes == 125


def test_order_promotion_matches_voxel(tmp_path):
    """read_mfem_mesh(order=p) reproduces the voxel generator's order-p
    node lattice on a uniform grid, and the FE gradient of a linear field
    is exact on the promoted mesh."""
    import jax.numpy as jnp
    from exaconstit_tpu.fem.geometry import grad_calc, jacobians
    from exaconstit_tpu.fem.space import FESpace
    from exaconstit_tpu.mesh.mfem_io import read_mfem_mesh
    from exaconstit_tpu.mesh.voxel import make_cartesian_mesh

    p = tmp_path / "unit.mesh"
    p.write_text(UNIT_HEX_MESH)
    for order in (2, 3):
        m = read_mfem_mesh(str(p), ref_levels=1, order=order)
        ref = make_cartesian_mesh([1, 1, 1], [1.0] * 3, order=order,
                                  ref_levels=1)
        assert m.num_nodes == ref.num_nodes
        got = np.array(sorted(map(tuple, np.round(m.coords, 12))))
        want = np.array(sorted(map(tuple, np.round(ref.coords, 12))))
        np.testing.assert_allclose(got, want, atol=1e-12)
        for attr in range(1, 7):
            assert len(m.bdr_nodes[attr]) == len(ref.bdr_nodes[attr])

    # analytic-gradient check (grad_test.cpp analog) on the order-2 mesh
    m = read_mfem_mesh(str(p), ref_levels=1, order=2)
    fes = FESpace.create(m)
    A = np.array([[2.0, 3.0, 4.0], [4.0, 2.0, 3.0], [3.0, 4.0, 2.0]])
    u = m.coords @ A.T
    el_u = jnp.asarray(u[np.asarray(fes.conn)])
    el_x = jnp.asarray(m.coords[np.asarray(fes.conn)])
    J = jacobians(el_x, jnp.asarray(fes.ref.dshape))
    g = np.asarray(grad_calc(el_u, jnp.asarray(fes.ref.dshape), J))
    np.testing.assert_allclose(g, np.broadcast_to(A, g.shape), atol=1e-11)


def test_reader_rejects_non_hex(tmp_path):
    from exaconstit_tpu.mesh.mfem_io import read_mfem_mesh

    bad = UNIT_HEX_MESH.replace("7 5 0 1 2 3 4 5 6 7",
                                "7 4 0 1 2 4")
    f = tmp_path / "tet.mesh"
    f.write_text(bad)
    try:
        read_mfem_mesh(str(f))
    except ValueError as e:
        assert "hexahedral" in str(e) and "tetrahedron" in str(e)
    else:
        raise AssertionError("tet mesh should be rejected loudly")


NEPER_GMSH = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
12
1 0 0 0
2 1 0 0
3 2 0 0
4 0 1 0
5 1 1 0
6 2 1 0
7 0 0 1
8 1 0 1
9 2 0 1
10 0 1 1
11 1 1 1
12 2 1 1
$EndNodes
$Elements
2
1 5 2 3 1 1 2 5 4 7 8 11 10
2 5 2 4 2 2 3 6 5 8 9 12 11
$EndElements
$Fasets
2
x0
1
1 1 4 10 7
z0
2
2 1 2 5 4
3 2 3 6 5
$EndFasets
"""


def test_neper_converter(tmp_path):
    from exaconstit_tpu.mesh.mfem_io import read_mfem_mesh

    src = tmp_path / "n2.msh"
    src.write_text(NEPER_GMSH)
    out = tmp_path / "n2.mesh"
    gfile = tmp_path / "grains.txt"
    script = os.path.join(REPO, "scripts", "meshing", "neper_v4_mesh.py")
    subprocess.run(
        [sys.executable, script, "-ifile", str(src), "-ofile", str(out),
         "--grain-file", str(gfile), "--exaconstit-attrs"], check=True)

    mesh = read_mfem_mesh(str(out))
    assert mesh.num_elems == 2 and mesh.num_nodes == 12
    # grains from the gmsh physical tag
    assert list(mesh.elem_attr) == [3, 4]
    assert [int(g) for g in np.loadtxt(gfile)] == [3, 4]
    # x0 faset -> attr 2; z0 -> attr 1 (ExaConstit convention)
    x0 = mesh.coords[mesh.bdr_nodes[2]]
    assert np.allclose(x0[:, 0], 0.0)
    z0 = mesh.coords[mesh.bdr_nodes[1]]
    assert np.allclose(z0[:, 2], 0.0) and len(z0) == 6


def _fepx_fixture(tmp_path):
    """One 10-node tet: corners at locals 0,2,4,9, mid-edges between."""
    corners = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    # FEpX local order: 0,2,4 base corners, 9 apex; 1,3,5 base mid-edges;
    # 6,7,8 mid-edges rising to the apex.
    mid = {1: (0, 1), 3: (1, 2), 5: (2, 0), 6: (0, 3), 7: (1, 3),
           8: (2, 3)}
    crd = np.zeros((10, 3))
    crd[0], crd[2], crd[4], crd[9] = corners
    for loc, (a, b) in mid.items():
        crd[loc] = 0.5 * (corners[a] + corners[b])
    lines = ["header"]
    for i, p in enumerate(crd):
        lines.append("%d %g %g %g" % (i + 1, *p))
    lines.append("1 " + " ".join(str(i + 1) for i in range(10)))
    (tmp_path / "t1.mesh").write_text("\n".join(lines) + "\n")
    (tmp_path / "t1.grain").write_text("1 els\n7 1\n")
    (tmp_path / "t1.kocks").write_text("head\n1 grains\n10. 20. 30.\nfoot\n")
    return crd


def test_fepx_converter(tmp_path):
    crd = _fepx_fixture(tmp_path)
    script = os.path.join(REPO, "scripts", "meshing", "fepx_mesh.py")
    ori = tmp_path / "ori.txt"
    out = tmp_path / "t1.vtk"
    subprocess.run(
        [sys.executable, script, str(tmp_path / "t1"), "-o", str(out),
         "--ori-file", str(ori)], check=True)

    txt = out.read_text().splitlines()
    assert "POINTS 10 double" in txt
    i = txt.index("POINTS 10 double")
    pts = np.array([[float(x) for x in l.split()] for l in txt[i + 1:i + 11]])
    np.testing.assert_allclose(pts, crd, atol=1e-12)
    i = next(k for k, l in enumerate(txt) if l.startswith("CELLS"))
    cell = [int(x) for x in txt[i + 1].split()]
    # VTK quadratic tet: 4 corners (FEpX locals 0,2,4,9) then 6 mid-edges
    assert cell == [10, 0, 2, 4, 9, 1, 3, 5, 6, 7, 8]
    i = next(k for k, l in enumerate(txt) if l.startswith("CELL_TYPES"))
    assert txt[i + 1].strip() == "24"
    assert "SCALARS material int" in txt
    i = txt.index("SCALARS material int")
    assert txt[i + 2].strip() == "7"

    q = np.loadtxt(ori)
    assert q.shape == (4,) and abs(np.linalg.norm(q) - 1) < 1e-12
    # Kocks (psi,theta,phi) -> Bunge ZXZ (psi+90, theta, 90-phi):
    # rebuild the rotation matrix and check the quaternion matches it.
    psi1, cap, psi2 = np.deg2rad([10 + 90.0, 20.0, 90 - 30.0])

    def rz(a):
        return np.array([[np.cos(a), np.sin(a), 0],
                         [-np.sin(a), np.cos(a), 0], [0, 0, 1.0]])

    rx = np.array([[1.0, 0, 0],
                   [0, np.cos(cap), np.sin(cap)],
                   [0, -np.sin(cap), np.cos(cap)]])
    r_ref = rz(psi2) @ rx @ rz(psi1)
    w, x, y, z = q
    r_q = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y + w * z), 2 * (x * z - w * y)],
        [2 * (x * y - w * z), 1 - 2 * (x * x + z * z), 2 * (y * z + w * x)],
        [2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y)],
    ])
    np.testing.assert_allclose(r_q, r_ref, atol=1e-12)
