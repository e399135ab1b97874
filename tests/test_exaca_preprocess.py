"""ExaCA preprocessing tests (workflows/uq_sweep/exaca_preprocess.py)."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "workflows", "uq_sweep", "exaca_preprocess.py")
sys.path.insert(0, os.path.dirname(SCRIPT))

import exaca_preprocess as ep  # noqa: E402


def make_csv(path, grid, voxel=1.25):
    nx, ny, nz = grid.shape
    lines = [f"Coordinates are in CA units, 1 cell = {voxel} microns. "
             "Data is cell-centered. Origin at 0,0,0",
             "X coord, Y coord, Z coord, Grain ID"]
    for z in range(nz):
        for y in range(ny):
            for x in range(nx):
                lines.append(f"{x},{y},{z},{grid[x, y, z]}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_read_and_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    grid = rng.integers(1, 5, size=(4, 2, 2)).astype(np.int32)
    p = tmp_path / "exaca.csv"
    make_csv(p, grid)
    voxel, got, dims = ep.read_exaca_csv(str(p))
    assert voxel == 1.25 and dims == (4, 2, 2)
    np.testing.assert_array_equal(got, grid)


def test_coarsen_majority():
    g = np.zeros((4, 4, 2), dtype=np.int32)
    g[:2, :2, :] = 7          # uniform block
    g[2:, :2, :] = [[3], [3]]  # mixed: 3 dominates
    g[2, 0, 0] = 9
    g[:2, 2:, :] = 5
    g[2:, 2:, :] = 1
    c = ep.coarsen_grid(g, 2)
    assert c.shape == (2, 2, 1)
    assert c[0, 0, 0] == 7 and c[1, 0, 0] == 3
    assert c[0, 1, 0] == 5 and c[1, 1, 0] == 1


def test_orientation_dedup_and_renumber():
    oris = np.tile([[1.0, 0, 0, 0]], (4, 1))
    oris[1] = [0.5, 0.5, 0.5, 0.5]
    # grains 3 and 7 both index ori (id-1)%4: 3->2, 7->2 (duplicate)
    ids = np.array([3, 7, 3, 2])
    grains, quats = ep.assign_orientations(ids, oris)
    assert grains.tolist() == [2, 3, 2, 1]  # renumbered by sorted unique
    assert quats.shape == (3, 4)
    np.testing.assert_allclose(np.linalg.norm(quats, axis=1), 1.0)
    # the duplicated orientation pair was perturbed apart
    assert not np.allclose(quats[1], quats[2])


def test_cli_end_to_end(tmp_path):
    rng = np.random.default_rng(1)
    grid = rng.integers(1, 9, size=(4, 4, 4)).astype(np.int32)
    csv = tmp_path / "exaca.csv"
    make_csv(csv, grid)
    orif = tmp_path / "uni.txt"
    q = rng.normal(size=(10, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    np.savetxt(orif, q)
    tmpl = tmp_path / "master.toml"
    tmpl.write_text("ngrains = {ngrains}\nori = '{ori_file}'\n"
                    "nx = {nx}\ntemp = {tempk}\n")
    out = tmp_path / "rve1"
    r = subprocess.run(
        [sys.executable, SCRIPT, str(csv), "--ori-list", str(orif),
         "--coarsen", "2", "--out", str(out), "--toml-template",
         str(tmpl), "--tempk", "500"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    grains = np.loadtxt(str(out) + "_grains.txt")
    quats = np.loadtxt(str(out) + "_ori.txt")
    assert grains.size == 8 and grains.min() >= 1
    assert quats.reshape(-1, 4).shape[0] == int(grains.max())
    toml = (str(out) + ".toml")
    assert "temp = 500.0" in open(toml).read()
