"""Slab-partitioned MechSystem: shard_map kernels with halo exchange.

Scale-ready variant of exaconstit_tpu.driver.MechSystem: instead of
replicated nodal vectors + per-matvec all-reduce, the node space is
block-partitioned with the elements (parallel/slab.py) and every jitted
kernel (setup, residual, Krylov matvec, diagonal, volume averages) runs
inside ``jax.shard_map`` — the E->T transpose becomes a LOCAL scatter-add
plus a neighbor-only ``ppermute`` halo exchange, and all reductions are
owner-masked ``psum``s.  Per-Krylov-iteration communication is
O(shared-plane nodes), the TPU analog of MFEM's P/P^T neighbor exchange
(src/mechanics_operator_ext.cpp:149-157).

Array layout (leading axes sharded over the 1-D ``"shards"`` mesh):

* nodal vectors: ``(S*(n_loc+1), 3)`` — per-shard local nodes + a trash
  row; convert with ``to_local_nodes`` / ``to_global_nodes``
* element/quadrature arrays: ``(S*ne_per, ...)`` in partition order —
  convert with ``permute_elems`` / ``unpermute_elems``

The host-side Newton / line-search / BC-corrector logic is inherited
unchanged from MechSystem (norms route through the distributed
``_norm``).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config.options import Assembly, IntegrationType, KrylovSolver
from ..driver import MechSystem
from ..fem import operators as ops
from ..fem.geometry import grad_calc, jacobians
from ..fem.space import FESpace
from ..solvers.krylov import pcg, pcg_refined
from ..utils.profiling import Regions
from .slab import SlabOps, build_slab_partition


class SlabMechSystem(MechSystem):
    """MechSystem with block-partitioned nodes + halo-exchange assembly."""

    def __init__(self, opt, mesh, model, device_mesh):
        # NOTE: intentionally does NOT call MechSystem.__init__ — all
        # jitted kernels are rebuilt in slab layout; the inherited host
        # methods (newton_solve, solve_init, make_jit_step) only touch
        # the attributes built here.
        import os

        self.opt = opt
        self.fes = FESpace.create(mesh)
        self.model = model
        self.regions = Regions() if os.environ.get(
            "EXACONSTIT_TPU_REGIONS") else None
        self.device_mesh = device_mesh
        self.dshape = jnp.asarray(self.fes.ref.dshape)
        self.qwts = jnp.asarray(self.fes.ref.qwts)
        self.assembly = opt.assembly
        self.bbar = opt.integ_type == IntegrationType.BBAR
        if self.bbar:
            self.assembly = Assembly.EA
        if opt.solver != KrylovSolver.PCG:
            raise ValueError("slab mode supports the PCG Krylov path; "
                             "set Solvers.Krylov.solver = 'PCG'")
        # slab keeps point-major per-shard layouts; the inherited host
        # methods dispatch on these flags (no CM flat vectors here, and
        # the generic _put_* helpers must be no-ops — slab device_puts
        # explicitly with its own shard)
        self.use_cm = False
        self._shard_r = self._shard_e = None

        AXIS = device_mesh.axis_names[0]
        S = device_mesh.devices.size
        conn = np.asarray(self.fes.conn)
        part = build_slab_partition(conn, self.fes.num_nodes, S)
        self.part = part
        self.slab_ops = SlabOps(part, device_mesh)
        self.ne_pad = part.n_shards * part.ne_per
        nl1 = part.n_loc + 1
        self.nn_loc_tot = part.n_shards * nl1
        nen = self.fes.ref.nnodes

        shard = NamedSharding(device_mesh, P(AXIS))
        put = lambda a: jax.device_put(jnp.asarray(a), shard)
        # flattened per-shard constants (leading axis = S*block)
        self._conn_l = put(part.conn_local.reshape(-1, nen))
        self.elem_mask = put(part.elem_mask.reshape(-1))
        self._owner3 = put(np.repeat(
            part.owner_mask.reshape(-1)[:, None], 3, axis=1).reshape(-1))
        self._send_up = put(part.send_up.reshape(-1))
        self._recv_dn = put(part.recv_dn.reshape(-1))
        self._send_dn = put(part.send_dn.reshape(-1))
        self._recv_up = put(part.recv_up.reshape(-1))
        self._shard = shard
        perm_fwd = self.slab_ops.perm_fwd
        perm_bwd = self.slab_ops.perm_bwd
        trash = part.trash
        ref = self.fes.ref
        mesh_dev = device_mesh
        model_ = model
        dshape, qwts = self.dshape, self.qwts
        bbar, assembly = self.bbar, self.assembly

        specs_n = P(AXIS)  # every sharded arg splits on its leading axis

        def smap(f, n_in, out_specs=P(AXIS)):
            return partial(shard_map, mesh=mesh_dev, check_vma=False,
                           in_specs=(specs_n,) * n_in + (P(),),
                           out_specs=out_specs)(f)

        # ---- per-shard helpers (run INSIDE shard_map); the per-shard
        # index blocks are passed as shard_map args so they split with
        # the data
        def scatter_halo_k(evec, conn_l, su, rd, sd, ru):
            y = jnp.zeros((nl1, 3), dtype=evec.dtype)
            y = y.at[conn_l.reshape(-1)].add(evec.reshape(-1, 3))
            y = y.at[trash].set(0.0)
            up = y[su]
            dn = y[sd]
            from_below = jax.lax.ppermute(up, AXIS, perm_fwd)
            from_above = jax.lax.ppermute(dn, AXIS, perm_bwd)
            y = y.at[rd].add(from_below)
            y = y.at[ru].add(from_above)
            return y.at[trash].set(0.0)

        def pdot(a, b, owner3):
            # cast the mask: an f64 mask would promote the f32 inner-PCG
            # recurrences and break the while_loop carry types
            return jax.lax.psum(jnp.sum(a * b * owner3.astype(a.dtype)),
                                AXIS)

        # ---- substep counts -------------------------------------------------
        def compute_nsub_k(v, x_beg, conn_l, dt):
            el_x = (x_beg + dt * v)[conn_l]
            el_v = v[conn_l]
            J = jacobians(el_x, dshape)
            vgrad = grad_calc(el_v, dshape, J)
            ne, nq = vgrad.shape[0], vgrad.shape[1]
            counts = None
            if hasattr(model_, "substep_counts"):
                counts = model_.substep_counts(
                    dt, vgrad.reshape(ne * nq, 3, 3))
            if counts is None:
                counts = 1
            # always per-point (scalar counts don't concatenate over shards)
            return jnp.broadcast_to(jnp.asarray(counts, jnp.int32),
                                    (ne * nq,))

        nsub_sm = smap(compute_nsub_k, 3)

        def compute_nsub(v, x_beg, dt):
            return nsub_sm(v, x_beg, self._conn_l, dt)

        self._compute_nsub_raw = compute_nsub
        # NOTE (here and below): every jitted entry point takes the
        # per-shard constant index arrays as explicit ARGUMENTS (bound by
        # a host-level lambda at call time) rather than closures — jit
        # embeds closed-over jax.Arrays as program constants by fetching
        # their value, which is illegal for arrays spanning other
        # processes' devices (multi-process slab runs).
        nsub_jit = jax.jit(nsub_sm)
        self._compute_nsub = lambda v, x, dt: nsub_jit(
            v, x, self._conn_l, dt)

        # ---- setup: residual + gradient data + diagonal ---------------------
        def setup_k(v, x_beg, state_beg, ess_flat, nsub, emask, conn_l,
                    su, rd, sd, ru, x_warm, args):
            dt, advance, warm_ok = args
            x_end = x_beg + dt * v * advance
            el_x = x_end[conn_l]
            el_v = v[conn_l]
            J = jacobians(el_x, dshape)
            vgrad = grad_calc(el_v, dshape, J)
            ne, nq = vgrad.shape[0], vgrad.shape[1]
            stress, state_end, c6, x_sol = model_.model_setup(
                dt, vgrad.reshape(ne * nq, 3, 3),
                state_beg.reshape(ne * nq, -1), nsub=nsub,
                x_warm=x_warm.reshape(ne * nq, 8), warm_ok=warm_ok,
                with_solution=True)
            stress_q = stress.reshape(ne, nq, 6)
            c6_q = c6.reshape(ne, nq, 6, 6)
            if bbar:
                force = ops.residual_force_bbar(el_x, dshape, qwts, stress_q)
            else:
                force = ops.residual_force(el_x, dshape, qwts, stress_q)
            force = force * emask[:, None, None]
            r = scatter_halo_k(force, conn_l, su, rd, sd, ru).reshape(-1)
            r = jnp.where(ess_flat.reshape(-1), 0.0, r)
            if bbar:
                k_data = ops.assemble_ea_gradient_bbar(el_x, dshape, qwts,
                                                       c6_q, dt)
                k_data = k_data * emask[:, None, None]
                dloc = ops.ea_diagonal(k_data, ref.nnodes)
            elif assembly == Assembly.PA:
                k_data = ops.assemble_pa_gradient(el_x, dshape, qwts, c6_q,
                                                  dt)
                k_data = k_data * emask[:, None, None, None, None, None]
                dloc = ops.pa_diagonal(el_x, dshape, qwts, c6_q, dt)
                dloc = dloc * emask[:, None, None]
            else:
                k_data = ops.assemble_ea_gradient(el_x, dshape, qwts, c6_q,
                                                  dt)
                k_data = k_data * emask[:, None, None]
                dloc = ops.ea_diagonal(k_data, ref.nnodes)
            diag = scatter_halo_k(dloc, conn_l, su, rd, sd, ru).reshape(-1)
            diag = jnp.where(ess_flat.reshape(-1), 1.0, diag)
            # trash rows: unit diagonal so the Jacobi preconditioner stays
            # finite (their residual/dot contributions are already zero)
            diag = diag.reshape(nl1, 3).at[trash].set(1.0).reshape(-1)
            return (r, k_data, diag, stress_q,
                    state_end.reshape(ne, nq, -1),
                    x_sol.reshape(ne, nq, 8))

        setup_sm = partial(
            shard_map, mesh=mesh_dev, check_vma=False,
            in_specs=(specs_n,) * 12 + (P(),),
            out_specs=(specs_n,) * 6)(setup_k)

        def setup_fn(v, x_beg, state_beg, dt, ess_mask, advance_coords,
                     nsub, x_warm, warm_ok):
            return setup_sm(v, x_beg, state_beg,
                            ess_mask.reshape(self.nn_loc_tot, 3),
                            nsub, self.elem_mask, self._conn_l,
                            self._send_up, self._recv_dn, self._send_dn,
                            self._recv_up, x_warm,
                            (dt, 1.0 if advance_coords else 0.0, warm_ok))

        self._setup_raw = setup_fn

        def setup_args(v, x_beg, state_beg, ess3, nsub, emask, conn_l, su,
                       rd, sd, ru, x_warm, args):
            return setup_sm(v, x_beg, state_beg, ess3, nsub, emask, conn_l,
                            su, rd, sd, ru, x_warm, args)

        setup_jit = jax.jit(setup_args)
        self._setup = lambda v, x_beg, state_beg, dt, ess_mask, \
            advance_coords, nsub, x_warm, warm_ok: setup_jit(
                v, x_beg, state_beg, ess_mask.reshape(self.nn_loc_tot, 3),
                nsub, self.elem_mask, self._conn_l, self._send_up,
                self._recv_dn, self._send_dn, self._recv_up, x_warm,
                (dt, 1.0 if advance_coords else 0.0, warm_ok))
        # warm-start carry (see MechSystem): slab carries the solution
        # point-major per element block, sharded like the state
        self._warm_arity = True
        self.warm_start = os.environ.get("EXACONSTIT_WARM_START",
                                         "1") != "0"

        def warm_zeros(dtype):
            return jax.device_put(
                jnp.zeros((self.ne_pad, ref.nqpts, 8), dtype), shard)

        self._warm_zeros = warm_zeros

        # ---- residual only --------------------------------------------------
        def residual_k(v, x_beg, state_beg, ess_flat, nsub, emask, conn_l,
                       su, rd, sd, ru, x_warm, args):
            dt, warm_ok = args
            x_end = x_beg + dt * v
            el_x = x_end[conn_l]
            el_v = v[conn_l]
            J = jacobians(el_x, dshape)
            vgrad = grad_calc(el_v, dshape, J)
            ne, nq = vgrad.shape[0], vgrad.shape[1]
            stress, _, _ = model_.model_setup(
                dt, vgrad.reshape(ne * nq, 3, 3),
                state_beg.reshape(ne * nq, -1), compute_tangent=False,
                nsub=nsub, x_warm=x_warm.reshape(ne * nq, 8),
                warm_ok=warm_ok)
            stress_q = stress.reshape(ne, nq, 6)
            if bbar:
                force = ops.residual_force_bbar(el_x, dshape, qwts, stress_q)
            else:
                force = ops.residual_force(el_x, dshape, qwts, stress_q)
            force = force * emask[:, None, None]
            r = scatter_halo_k(force, conn_l, su, rd, sd, ru).reshape(-1)
            return jnp.where(ess_flat.reshape(-1), 0.0, r)

        residual_sm = smap(residual_k, 12, out_specs=specs_n)
        residual_jit = jax.jit(residual_sm)
        self._residual_only = lambda v, x_beg, state_beg, dt, ess_mask, \
            nsub, x_warm, warm_ok: residual_jit(
                v, x_beg, state_beg, ess_mask.reshape(self.nn_loc_tot, 3),
                nsub, self.elem_mask, self._conn_l, self._send_up,
                self._recv_dn, self._send_dn, self._recv_up, x_warm,
                (dt, warm_ok))

        # ---- matvec / Krylov -------------------------------------------------
        def matvec_local(k_data, xflat, ess_flat, conn_l, su, rd, sd, ru):
            x = jnp.where(ess_flat, 0.0, xflat).reshape(nl1, 3)
            el_u = x[conn_l]
            if assembly == Assembly.PA:
                el_y = ops.apply_pa_gradient(k_data,
                                             dshape.astype(el_u.dtype), el_u)
            else:
                el_y = ops.apply_ea_gradient(k_data, el_u)
            y = scatter_halo_k(el_y, conn_l, su, rd, sd, ru).reshape(-1)
            return jnp.where(ess_flat, xflat, y)

        use_refined = (getattr(opt, "mixed_krylov", True)
                       and jax.config.jax_enable_x64)

        def krylov_k(k_data, diag, b, ess_flat, conn_l, su, rd, sd, ru,
                     owner3, _dt):
            ess1 = ess_flat.reshape(-1)
            matvec = lambda x: matvec_local(k_data, x, ess1, conn_l, su, rd,
                                            sd, ru)
            dinv = 1.0 / diag
            precond = lambda v: dinv * v
            dot = lambda a, c: pdot(a, c, owner3)
            if use_refined and b.dtype == jnp.float64:
                f32 = jnp.float32
                k32 = k_data.astype(f32)
                dinv32 = dinv.astype(f32)
                matvec32 = lambda x: matvec_local(k32, x, ess1, conn_l, su,
                                                  rd, sd, ru)
                precond32 = lambda v: dinv32 * v
                return pcg_refined(matvec, precond, matvec32, precond32, b,
                                   opt.krylov_rel_tol, opt.krylov_abs_tol,
                                   opt.krylov_iter, dot=dot)
            return pcg(matvec, precond, b, opt.krylov_rel_tol,
                       opt.krylov_abs_tol, opt.krylov_iter, dot=dot)

        krylov_sm = partial(
            shard_map, mesh=mesh_dev, check_vma=False,
            in_specs=(specs_n,) * 10 + (P(),),
            out_specs=(specs_n, P(), P(), P()))(krylov_k)

        def krylov_solve(k_data, diag, b, ess_flat):
            return krylov_sm(k_data, diag, b, ess_flat, self._conn_l,
                             self._send_up, self._recv_dn, self._send_dn,
                             self._recv_up, self._owner3, 0.0)

        self._krylov_raw = krylov_solve
        krylov_jit = jax.jit(krylov_sm)
        self._krylov = lambda k_data, diag, b, ess_flat: krylov_jit(
            k_data, diag, b, ess_flat, self._conn_l, self._send_up,
            self._recv_dn, self._send_dn, self._recv_up, self._owner3, 0.0)

        # ---- unconstrained matvec (SolveInit) -------------------------------
        def matvec_unc_k(k_data, xflat, conn_l, su, rd, sd, ru, _dt):
            x = xflat.reshape(nl1, 3)
            el_u = x[conn_l]
            if assembly == Assembly.PA:
                el_y = ops.apply_pa_gradient(k_data,
                                             dshape.astype(el_u.dtype), el_u)
            else:
                el_y = ops.apply_ea_gradient(k_data, el_u)
            return scatter_halo_k(el_y, conn_l, su, rd, sd, ru).reshape(-1)

        matvec_unc_sm = smap(matvec_unc_k, 7, out_specs=specs_n)
        matvec_unc_jit = jax.jit(matvec_unc_sm)
        self._grad_matvec_unconstrained = lambda k_data, xflat: \
            matvec_unc_jit(k_data, xflat, self._conn_l, self._send_up,
                           self._recv_dn, self._send_dn, self._recv_up, 0.0)

        def lower_grad_matvec_unconstrained(k_data, xflat):
            """AOT-lower the unconstrained Jacobian matvec (for tests that
            inspect the compiled HLO, e.g. halo-traffic accounting)."""
            return matvec_unc_jit.lower(
                k_data, xflat, self._conn_l, self._send_up,
                self._recv_dn, self._send_dn, self._recv_up, 0.0)

        self.lower_grad_matvec_unconstrained = lower_grad_matvec_unconstrained

        # ---- norms / gathers / averages -------------------------------------
        def norm_k(r, owner3, _dt):
            return jnp.sqrt(pdot(r, r, owner3))

        norm_sm = smap(norm_k, 2, out_specs=P())

        def norm_fn(r):
            return norm_sm(r.reshape(-1), self._owner3, 0.0)

        self._norm_raw = norm_fn
        norm_jit = jax.jit(norm_sm)
        self._norm = lambda r: norm_jit(r.reshape(-1), self._owner3, 0.0)

        def gather_k(x, conn_l, _dt):
            return x[conn_l]

        gather_sm = smap(gather_k, 2, out_specs=specs_n)
        gather_jit = jax.jit(gather_sm)
        self._gather = lambda x: gather_jit(x, self._conn_l, 0.0)

        def vol_avg_k(values_q, el_x, emask, args):
            divide = args
            wts = ops.quad_point_volumes(el_x, dshape, qwts)
            wts = wts * emask[:, None]
            s = jax.lax.psum(jnp.einsum("eq,eqk->k", wts, values_q), AXIS)
            w = jax.lax.psum(jnp.sum(wts), AXIS)
            return jnp.where(divide > 0, s / w, s)

        vol_avg_sm = partial(
            shard_map, mesh=mesh_dev, check_vma=False,
            in_specs=(specs_n,) * 3 + (P(),),
            out_specs=P())(vol_avg_k)

        vol_avg_jit = jax.jit(vol_avg_sm)
        self._vol_avg = lambda values_q, el_x, divide: vol_avg_jit(
            values_q, el_x, self.elem_mask, 1.0 if divide else 0.0)

        def max_deff_k(v, x_beg, emask, conn_l, dt):
            el_x = (x_beg + dt * v)[conn_l]
            el_v = v[conn_l]
            J = jacobians(el_x, dshape)
            vgrad = grad_calc(el_v, dshape, J)
            d = 0.5 * (vgrad + jnp.swapaxes(vgrad, -1, -2))
            d = d - (jnp.trace(d, axis1=-2, axis2=-1) / 3.0)[..., None, None] \
                * jnp.eye(3)
            deff = jnp.sqrt(2.0 / 3.0 * jnp.sum(d * d, axis=(-2, -1)))
            return jax.lax.pmax(jnp.max(deff * emask[:, None]), AXIS)

        max_deff_sm = partial(
            shard_map, mesh=mesh_dev, check_vma=False,
            in_specs=(specs_n,) * 4 + (P(),),
            out_specs=P())(max_deff_k)
        max_deff_jit = jax.jit(max_deff_sm)
        self._max_deff = lambda v, x, dt: max_deff_jit(
            v, x, self.elem_mask, self._conn_l, dt)

    # ---- layout adapters (Simulation-facing; see MechSystem) ---------------
    # The device-resident contract is the slab layout: nodal fields
    # (S*(n_loc+1), c) local blocks, element/qpt fields (S*ne_per, ...)
    # in partition order.  Host code still converses in the reference's
    # global point-major shapes.

    def to_node(self, arr):
        return self.to_local_nodes(np.asarray(arr))

    def from_node(self, dev):
        return self.to_global_nodes(dev)

    def to_ess(self, mask):
        """Global (nn, 3) bool mask -> flat local device mask."""
        return self.to_local_nodes(np.asarray(mask)).reshape(-1)

    def to_state(self, pm):
        """Global (ne[_pad], nq, k) -> sharded (S*ne_per, nq, k)."""
        return self.permute_elems(np.asarray(pm)[:self.fes.num_elems])

    def from_state(self, dev):
        """Sharded (S*ne_per, nq, k) -> global np (ne, nq, k)."""
        return self.unpermute_elems(dev)

    to_stress = to_state
    from_stress = from_state

    def zeros_stress(self, dtype=None):
        return jax.device_put(
            jnp.zeros((self.ne_pad, self.fes.ref.nqpts, 6), dtype=dtype),
            self._shard)

    # ---- layout conversions (host) ------------------------------------------
    def to_local_nodes(self, tvec_global):
        """np (num_nodes, c) -> sharded jnp (S*(n_loc+1), c)."""
        loc = self.slab_ops.to_local(np.asarray(tvec_global))
        return jax.device_put(
            jnp.asarray(loc.reshape(self.nn_loc_tot, *loc.shape[2:])),
            self._shard)

    def to_global_nodes(self, tvec_local):
        """sharded (S*(n_loc+1), c) -> np (num_nodes, c).

        Multi-process safe: the block-sharded array is gathered
        collectively first (MechSystem._fetch), every process returning
        the same global array — the Distribute/allgather pattern of the
        reference's rank-boundary fields."""
        p = self.part
        loc = self._fetch(tvec_local).reshape(p.n_shards, p.n_loc + 1, -1)
        return self.slab_ops.to_global(loc, self.fes.num_nodes)

    def permute_elems(self, arr_global):
        """np (ne, ...) element array -> sharded (S*ne_per, ...)."""
        return jax.device_put(jnp.asarray(arr_global[self.part.elem_perm]),
                              self._shard)

    def unpermute_elems(self, arr_local):
        """(S*ne_per, ...) -> np (ne, ...) in original element order."""
        a = self._fetch(arr_local)
        out = np.empty((self.fes.num_elems,) + a.shape[1:], dtype=a.dtype)
        real = self.part.elem_mask.reshape(-1) > 0
        out[self.part.elem_perm[real]] = a[real]
        return out
