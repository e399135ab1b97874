"""Geometric multigrid preconditioner on the structured voxel hierarchy.

The reference carries hypre BoomerAMG for the FULL-assembly path exactly
because Jacobi-preconditioned Krylov iteration counts grow with mesh
resolution (src/system_driver.cpp:116-150).  The TPU-native analog does
not need algebraic coarsening: production meshes are structured voxel
bricks (mesh.structure), so the natural hierarchy is geometric — halve
the element grid while every dimension stays even, Galerkin-coarsen the
EA element stiffness blocks through the fixed trilinear embedding, and
run a Chebyshev(l1-Jacobi)-smoothed V-cycle as the PCG preconditioner.

Everything here is jit-traceable: the hierarchy is rebuilt from the
current EA blocks inside the Krylov jit each Newton iteration (the mesh
moves, so the stiffness changes), Chebyshev eigenvalue bounds come from
a short power iteration, and the coarsest level is solved densely
(Cholesky) at a few hundred dofs.

Array conventions match the component-major MechSystem path:
* nodal fields: flat (3*nn,) component planes, reshapeable to
  (3, npz, npy, npx) (x-fastest node numbering, mesh/voxel.py)
* EA blocks: (24, 24, ne) with dof = a*3 + i (node-major)
* element grid: e = i + nx*(j + ny*k)

Design notes: coarse-level operators keep essential dofs eliminated
(fine blocks are row/col-masked before the RAP so the coarse system
never reintroduces constrained dofs), prolongated corrections are
zeroed on fine essential dofs, and the V(1,1) cycle with the same
pre/post Chebyshev smoother is a symmetric positive operator, so PCG
convergence theory applies unchanged.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# dense-direct threshold for the coarsest level (3*nn dofs)
_COARSE_DOFS = 3000


# ---------------------------------------------------------------------------
# host-side metadata (static per mesh)
# ---------------------------------------------------------------------------

def _grid_conn(nx, ny, nz):
    """Order-1 hex connectivity on an (nx, ny, nz) voxel grid."""
    npx, npy = nx + 1, ny + 1

    def gid(i, j, k):
        return i + npx * (j + npy * k)

    li, lj, lk = np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij")
    li = li.transpose(2, 1, 0).ravel()
    lj = lj.transpose(2, 1, 0).ravel()
    lk = lk.transpose(2, 1, 0).ravel()
    conn = np.empty((nx * ny * nz, 8), dtype=np.int32)
    e = 0
    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                conn[e] = gid(i + li, j + lj, k + lk)
                e += 1
    return conn


def _octant_weights():
    """W[o, a, b]: trilinear weight of coarse local node b at fine local
    node a of octant o (fine element (ox,oy,oz) inside a coarse cell).

    Local node order is x-fastest: a = px + 2*py + 4*pz.
    """
    W = np.zeros((8, 8, 8))
    for oz in range(2):
        for oy in range(2):
            for ox in range(2):
                o = ox + 2 * oy + 4 * oz
                for pz in range(2):
                    for py in range(2):
                        for px in range(2):
                            a = px + 2 * py + 4 * pz
                            xi = ((ox + px) / 2.0, (oy + py) / 2.0,
                                  (oz + pz) / 2.0)
                            for bz in range(2):
                                for by in range(2):
                                    for bx in range(2):
                                        b = bx + 2 * by + 4 * bz
                                        w = ((xi[0] if bx else 1 - xi[0])
                                             * (xi[1] if by else 1 - xi[1])
                                             * (xi[2] if bz else 1 - xi[2]))
                                        W[o, a, b] = w
    return W


def _dof_weights():
    """(8, 24, 24) octant weights expanded to dof level (kron with I3)."""
    W = _octant_weights()
    Wd = np.zeros((8, 24, 24))
    for o in range(8):
        Wd[o] = np.kron(W[o], np.eye(3))
    return Wd


class GMGMeta:
    """Static per-mesh hierarchy metadata (host numpy)."""

    def __init__(self, structure):
        nx, ny, nz = (int(v) for v in structure)
        self.grids = [(nx, ny, nz)]
        # coarsen while every dimension stays even, until the level is
        # small enough to solve directly
        while (nx % 2 == 0 and ny % 2 == 0 and nz % 2 == 0
               and 3 * (nx + 1) * (ny + 1) * (nz + 1) > _COARSE_DOFS):
            nx, ny, nz = nx // 2, ny // 2, nz // 2
            self.grids.append((nx, ny, nz))
        gx, gy, gz = self.grids[-1]
        # dense direct solve only when the coarsest level is small; an
        # odd-dimension early stop falls back to heavy Chebyshev there
        self.coarse_dense = (3 * (gx + 1) * (gy + 1) * (gz + 1)
                             <= _COARSE_DOFS)
        # if the finest grid itself cannot coarsen, GMG degenerates to
        # Chebyshev-Jacobi on one level + a dense solve is meaningless;
        # callers should fall back to Jacobi in that case
        self.nlevels = len(self.grids)
        self.conns = [None] + [_grid_conn(*g) for g in self.grids[1:]]
        self.wd = _dof_weights()

    @property
    def usable(self):
        return self.nlevels >= 2


# ---------------------------------------------------------------------------
# traced pieces
# ---------------------------------------------------------------------------

def _mask_blocks(k_cm, ess_el):
    """Zero rows/cols of element blocks at essential dofs.

    k_cm (24, 24, ne); ess_el (24, ne) boolean."""
    keep = 1.0 - ess_el.astype(k_cm.dtype)
    return k_cm * keep[:, None, :] * keep[None, :, :]


def _rap(k_f, grid_f, wd):
    """Galerkin-coarsen (24, 24, ne_f) blocks to the half grid."""
    nx, ny, nz = grid_f
    kg = k_f.reshape(24, 24, nz, ny, nx)
    out = None
    for o in range(8):
        ox, oy, oz = o & 1, (o >> 1) & 1, (o >> 2) & 1
        ko = kg[:, :, oz::2, oy::2, ox::2]
        w = jnp.asarray(wd[o], k_f.dtype)
        # W^T K W per element
        t = jnp.einsum("ab,bcKJI->acKJI", w.T, ko)
        t = jnp.einsum("acKJI,cd->adKJI", t, w)
        out = t if out is None else out + t
    nzc, nyc, nxc = nz // 2, ny // 2, nx // 2
    return out.reshape(24, 24, nzc * nyc * nxc)


def _coarsen_field(a3, grid_f):
    """Node field (3, nn_f) -> (3, nn_c) by injection at even nodes."""
    nx, ny, nz = grid_f
    g = a3.reshape(3, nz + 1, ny + 1, nx + 1)
    return g[:, ::2, ::2, ::2].reshape(3, -1)


def _prolong(c3, grid_f):
    """Coarse (3, nn_c) -> fine (3, nn_f) trilinear interpolation."""
    nx, ny, nz = grid_f

    def interp_axis(a, axis, n_f):
        even = a
        sl0 = [slice(None)] * a.ndim
        sl1 = [slice(None)] * a.ndim
        sl0[axis] = slice(0, -1)
        sl1[axis] = slice(1, None)
        odd = 0.5 * (a[tuple(sl0)] + a[tuple(sl1)])
        shape = list(a.shape)
        shape[axis] = n_f
        out = jnp.zeros(shape, a.dtype)
        sle = [slice(None)] * a.ndim
        slo = [slice(None)] * a.ndim
        sle[axis] = slice(0, None, 2)
        slo[axis] = slice(1, None, 2)
        return out.at[tuple(sle)].set(even).at[tuple(slo)].set(odd)

    g = c3.reshape(3, nz // 2 + 1, ny // 2 + 1, nx // 2 + 1)
    g = interp_axis(g, 1, nz + 1)
    g = interp_axis(g, 2, ny + 1)
    g = interp_axis(g, 3, nx + 1)
    return g.reshape(3, -1)


def _restrict(r3, grid_f):
    """Adjoint of _prolong: fine (3, nn_f) -> coarse (3, nn_c)."""
    nx, ny, nz = grid_f

    def adj_axis(a, axis, n_c):
        sle = [slice(None)] * a.ndim
        slo = [slice(None)] * a.ndim
        sle[axis] = slice(0, None, 2)
        slo[axis] = slice(1, None, 2)
        even = a[tuple(sle)]
        odd = a[tuple(slo)]
        # even nodes receive their own value + half of both odd neighbors
        sl_lo = [slice(None)] * even.ndim
        sl_hi = [slice(None)] * even.ndim
        sl_lo[axis] = slice(0, -1)
        sl_hi[axis] = slice(1, None)
        out = even.at[tuple(sl_lo)].add(0.5 * odd)
        out = out.at[tuple(sl_hi)].add(0.5 * odd)
        return out

    g = r3.reshape(3, nz + 1, ny + 1, nx + 1)
    g = adj_axis(g, 1, nz // 2 + 1)
    g = adj_axis(g, 2, ny // 2 + 1)
    g = adj_axis(g, 3, nx // 2 + 1)
    return g.reshape(3, -1)


def _ea_matvec(k_cm, conn, x3, ess1):
    """Masked EA matvec on a coarse level (component-major field)."""
    x3 = jnp.where(ess1.reshape(3, -1), 0.0, x3)
    el_u = x3[:, conn.T]  # (3, 8, ne)
    ndof = k_cm.shape[0]
    u = el_u.transpose(1, 0, 2).reshape(ndof, -1)
    y = jnp.einsum("abe,be->ae", k_cm, u).reshape(8, 3, -1)
    out = jnp.zeros_like(x3)
    out = out.at[:, conn.T].add(y.transpose(1, 0, 2))
    return jnp.where(ess1.reshape(3, -1), x3, out)


def _power_lmax(matvec, dinv, n, dtype, iters=8):
    """Upper bound on lambda_max(D^-1 A) by power iteration (+10%)."""
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (n,), dtype)
    v = v / jnp.linalg.norm(v)

    def body(_, v):
        w = dinv * matvec(v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v)
    w = dinv * matvec(v)
    lam = jnp.vdot(v, w) / jnp.maximum(jnp.vdot(v, v), 1e-30)
    return 1.1 * lam


def _chebyshev(matvec, dinv, b, x, lmax, degree=3):
    """Chebyshev(Jacobi) smoothing on [0.3*lmax, 1.1*lmax] (hypre-style).

    Standard three-term recurrence; returns the smoothed iterate."""
    lmin = 0.3 * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma
    r = b - matvec(x)
    d = (dinv * r) / theta
    for _ in range(degree):
        x = x + d
        r = r - matvec(d)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = (rho_new * rho) * d + (2.0 * rho_new / delta) * (dinv * r)
        rho = rho_new
    return x


def build_hierarchy(meta: GMGMeta, k_fine, ess_fine, fine_matvec,
                    fine_diag):
    """Trace the level operators from the current fine EA blocks.

    k_fine (24, 24, ne_real) already element-masked (padding excluded);
    ess_fine flat (3*nn,) boolean; fine_matvec/fine_diag are the
    production masked matvec and assembled diagonal for level 0.
    Returns a list of per-level dicts (level 0 = finest).
    """
    dtype = k_fine.dtype
    levels = []
    nn0 = ess_fine.size // 3
    dinv0 = 1.0 / fine_diag
    lmax0 = _power_lmax(fine_matvec, dinv0, ess_fine.size, dtype)
    levels.append(dict(matvec=fine_matvec, dinv=dinv0, lmax=lmax0,
                       ess=ess_fine, grid=meta.grids[0], nn=nn0))

    # mask once at the finest level; RAP keeps the elimination
    conn_f = None  # level-0 matvec comes from the caller
    ess3 = ess_fine.reshape(3, nn0)
    k_cur = k_fine
    for lev in range(1, meta.nlevels):
        grid_f = meta.grids[lev - 1]
        if lev == 1:
            # eliminate fine essential dofs from the blocks before RAP
            nxf, nyf, nzf = grid_f
            conn0 = _grid_conn(nxf, nyf, nzf)
            el_ess = ess3[:, conn0.T]  # (3, 8, ne)
            ess_el = el_ess.transpose(1, 0, 2).reshape(24, -1)
            k_cur = _mask_blocks(k_cur, ess_el)
        k_cur = _rap(k_cur, grid_f, meta.wd)
        ess3 = _coarsen_field(ess3.astype(jnp.float32), grid_f) > 0.5
        conn = jnp.asarray(meta.conns[lev])
        ess1 = ess3.reshape(-1)
        nn = ess1.size // 3

        # assembled diagonal (l1-free plain Jacobi, matching level 0)
        dloc = jnp.einsum("aae->ae", k_cur).reshape(8, 3, -1)
        diag3 = jnp.zeros((3, nn), dtype)
        diag3 = diag3.at[:, conn.T].add(dloc.transpose(1, 0, 2))
        diag = jnp.where(ess1, 1.0, diag3.reshape(-1))
        diag = jnp.where(jnp.abs(diag) > 1e-30, diag, 1.0)

        k_lev, conn_lev, ess_lev = k_cur, conn, ess1

        def mk_matvec(k_lev=k_lev, conn_lev=conn_lev, ess_lev=ess_lev,
                      nn=nn):
            def mv(x):
                return _ea_matvec(k_lev, conn_lev,
                                  x.reshape(3, nn), ess_lev).reshape(-1)
            return mv

        mv = mk_matvec()
        dinv = 1.0 / diag
        lmax = _power_lmax(mv, dinv, 3 * nn, dtype)
        levels.append(dict(matvec=mv, dinv=dinv, lmax=lmax, ess=ess1,
                           grid=meta.grids[lev], nn=nn, k=k_cur,
                           conn=conn))
    return levels


def _dense_solve(level, b):
    """Coarsest-level direct solve (Cholesky on the assembled matrix)."""
    k, conn, ess = level["k"], level["conn"], level["ess"]
    nn = level["nn"]
    n3 = 3 * nn
    # dof indices per element: node-major, comp-minor (matches blocks)...
    # in the component-plane field layout dof = c*nn + node, so build the
    # permutation from block dof (a*3+i) to field dof (i*nn + conn[a])
    idx = (conn[:, :, None] + nn * jnp.arange(3)[None, None, :])
    idx = idx.reshape(-1, 24)  # (ne, 24) field dof per block dof
    A = jnp.zeros((n3, n3), k.dtype)
    kb = jnp.transpose(k, (2, 0, 1))  # (ne, 24, 24)
    A = A.at[idx[:, :, None], idx[:, None, :]].add(kb)
    keep = 1.0 - ess.astype(k.dtype)
    A = A * keep[:, None] * keep[None, :] + jnp.diag(ess.astype(k.dtype))
    # SPD after elimination; small (<= _COARSE_DOFS)
    L = jnp.linalg.cholesky(A + 1e-12 * jnp.eye(n3, dtype=k.dtype))
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


def v_cycle(levels, r, degree=3, coarse_dense=True):
    """One V(1,1) cycle; returns z ~= A^-1 r (symmetric in A-inner
    product -> valid PCG preconditioner)."""

    def cycle(lev, b):
        L = levels[lev]
        if lev == len(levels) - 1:
            if coarse_dense:
                return _dense_solve(L, b)
            # odd-dimension early stop: heavy Chebyshev instead
            return _chebyshev(L["matvec"], L["dinv"], b,
                              jnp.zeros_like(b), L["lmax"], 24)
        x = _chebyshev(L["matvec"], L["dinv"], b,
                       jnp.zeros_like(b), L["lmax"], degree)
        r = b - L["matvec"](x)
        r = jnp.where(L["ess"], 0.0, r)
        rc = _restrict(r.reshape(3, L["nn"]), L["grid"]).reshape(-1)
        rc = jnp.where(levels[lev + 1]["ess"], 0.0, rc)
        zc = cycle(lev + 1, rc)
        zf = _prolong(zc.reshape(3, levels[lev + 1]["nn"]),
                      L["grid"]).reshape(-1)
        zf = jnp.where(L["ess"], 0.0, zf)
        x = x + zf
        return _chebyshev(L["matvec"], L["dinv"], b, x, L["lmax"], degree)

    return cycle(0, r)
