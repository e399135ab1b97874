"""System driver: time stepping, Newton-Krylov solves, BCs, outputs.

TPU-native equivalent of the reference's SystemDriver + ExaNewtonSolver +
main time loop (src/system_driver.cpp, src/mechanics_solver.cpp,
src/mechanics_driver.cpp:837-968):

* per Newton iteration, one jitted function recomputes geometry from the
  advanced coordinates (moving mesh), evaluates the material at every
  quadrature point, forms the masked residual, assembles the EA/PA
  gradient data and the Jacobi diagonal — all fused by XLA;
* the Krylov solve is a second jitted while_loop (solvers/krylov.py);
* the outer Newton loop, auto-dt retry, BC-change corrector (SolveInit)
  and file outputs run on the host, mirroring the reference's control
  flow exactly.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config.options import (Assembly, ExaOptions, IntegrationType,
                             KrylovSolver, MechType, NLSolver, OriType,
                             parse_options)
from .fem import operators as ops
from .fem.geometry import grad_calc, jacobians
from .fem.space import FESpace
from .mesh.voxel import HexMesh, make_cartesian_mesh
from .models.ecmech import ECMechModel, build_model
from .solvers.krylov import gmres, minres, pcg, pcg_refined
from .utils import tensors as tn
from .utils.guards import checked_jit
from .utils.profiling import Regions


# ----------------------------------------------------------------------------
# Boundary conditions (BCManager + BCData equivalents)
# ----------------------------------------------------------------------------

_COMPONENTS = {
    0: (False, False, False), 1: (True, False, False),
    2: (False, True, False), 3: (False, False, True),
    4: (True, True, False), 5: (False, True, True),
    6: (True, False, True), 7: (True, True, True),
}


@dataclasses.dataclass
class StepBCs:
    """Resolved boundary conditions for one BC epoch (update step)."""

    ess_mask: np.ndarray  # (nnodes, 3) bool: all constrained dofs
    vel_nodes: np.ndarray  # node ids on active velocity-BC attributes
    vel_values: np.ndarray  # (len(vel_nodes), 3) scale*essVel at those nodes
    vgrad_mask: np.ndarray  # (nnodes, 3) bool: velocity-gradient BC dofs
    vgrad: np.ndarray  # (3, 3)
    has_vel: bool
    has_vgrad: bool


def resolve_step_bcs(opt: ExaOptions, fes: FESpace, step: int) -> StepBCs:
    """Mirror BCManager::updateBCData (src/BCManager.cpp:10-142)."""
    ids_tot = opt.map_ess_id["total"][step]
    comps_tot = opt.map_ess_comp["total"][step]
    active = {}
    for i, c in zip(ids_tot, comps_tot):
        if c != 0:
            cur = active.get(i, (False, False, False))
            newc = _COMPONENTS[abs(c)]
            active[i] = tuple(a or b for a, b in zip(cur, newc))
    ess_mask = fes.ess_mask(active)

    # velocity BCs
    ids_v = opt.map_ess_id["ess_vel"][step]
    comps_v = opt.map_ess_comp["ess_vel"][step]
    vals_v = opt.map_ess_vel.get(step, [])
    node_vals = {}
    for i, (attr, c) in enumerate(zip(ids_v, comps_v)):
        if c == 0:
            continue
        scale = np.array(_COMPONENTS[c], dtype=float)
        vel = np.array(vals_v[3 * i:3 * i + 3], dtype=float)
        for n in fes.mesh.bdr_nodes.get(int(attr), []):
            node_vals[int(n)] = vel * scale
    if node_vals:
        vel_nodes = np.array(sorted(node_vals.keys()), dtype=np.int32)
        vel_values = np.stack([node_vals[int(n)] for n in vel_nodes])
    else:
        vel_nodes = np.zeros(0, dtype=np.int32)
        vel_values = np.zeros((0, 3))

    # velocity-gradient BCs
    ids_g = opt.map_ess_id["ess_vgrad"][step]
    comps_g = opt.map_ess_comp["ess_vgrad"][step]
    active_g = {}
    for attr, c in zip(ids_g, comps_g):
        if c != 0:
            cur = active_g.get(attr, (False, False, False))
            newc = _COMPONENTS[c]
            active_g[attr] = tuple(a or b for a, b in zip(cur, newc))
    vgrad_mask = fes.ess_mask(active_g)
    flat = opt.map_ess_vgrad.get(step, [])
    vgrad = np.array(flat, dtype=float).reshape(3, 3) if len(flat) == 9 \
        else np.zeros((3, 3))

    return StepBCs(ess_mask=ess_mask, vel_nodes=vel_nodes,
                   vel_values=vel_values, vgrad_mask=vgrad_mask, vgrad=vgrad,
                   has_vel=len(vel_nodes) > 0, has_vgrad=bool(active_g))


# ----------------------------------------------------------------------------
# The mechanics system
# ----------------------------------------------------------------------------

class MechSystem:
    """Owns the FE space, material model, and jitted compute kernels.

    With ``device_mesh`` set, element-axis arrays shard across the 1-D
    ``"elems"`` mesh axis (domain decomposition, the TPU analog of the
    reference's metis/MPI partitioning) while nodal vectors stay
    replicated; XLA's SPMD partitioner turns the E->T scatter-adds into
    local partial sums + all-reduces.
    """

    def __init__(self, opt: ExaOptions, mesh: HexMesh, model: ECMechModel,
                 device_mesh=None):
        self.opt = opt
        self.fes = FESpace.create(mesh)
        self.model = model
        # region wall-time accounting (Caliper equivalent, SURVEY.md §5);
        # enabled with EXACONSTIT_TPU_REGIONS=1 (block_until_ready changes
        # host/device pipelining, so it is opt-in)
        self.regions = Regions() if os.environ.get(
            "EXACONSTIT_TPU_REGIONS") else None
        self.dshape = jnp.asarray(self.fes.ref.dshape)
        self.qwts = jnp.asarray(self.fes.ref.qwts)
        self.assembly = opt.assembly
        self.bbar = opt.integ_type == IntegrationType.BBAR
        if self.bbar:
            # the reference has no PA gradient for BBar either
            # (mechanics_integrators.hpp:107-110); EA covers FULL too
            self.assembly = Assembly.EA
        self.device_mesh = device_mesh
        nn = self.fes.num_nodes

        # element padding + mask for sharding
        ne_real = self.fes.num_elems
        if device_mesh is not None:
            from .parallel.sharding import (elem_sharding, pad_elements,
                                             replicated)
            n_sh = device_mesh.devices.size
            ne_pad = pad_elements(ne_real, n_sh)
            self._shard_e = elem_sharding(device_mesh)
            self._shard_r = replicated(device_mesh)
        else:
            ne_pad = ne_real
            self._shard_e = self._shard_r = None
        self.ne_pad = ne_pad
        mask = np.zeros(ne_pad)
        mask[:ne_real] = 1.0
        self.elem_mask = jnp.asarray(mask)
        conn = np.asarray(self.fes.conn)
        if ne_pad > ne_real:
            conn = np.concatenate(
                [conn, np.tile(conn[:1], (ne_pad - ne_real, 1))], axis=0)
        self.conn_pad = jnp.asarray(conn)
        # Pre-placing the closed-over constants avoids a resharding per
        # call — but a jit may only close over process-local arrays, so
        # multi-process (jax.distributed) runs leave them as host
        # constants and let the partitioner place them.
        _place_consts = (device_mesh is not None
                         and jax.process_count() == 1)
        if _place_consts:
            self.conn_pad = jax.device_put(self.conn_pad, self._shard_e)
            self.elem_mask = jax.device_put(self.elem_mask, self._shard_r)

        ref = self.fes.ref

        def constrain_e(x):
            if self._shard_e is not None:
                return jax.lax.with_sharding_constraint(x, self._shard_e)
            return x

        def constrain_r(x):
            if self._shard_r is not None:
                return jax.lax.with_sharding_constraint(x, self._shard_r)
            return x

        self._constrain_e = constrain_e
        self._constrain_r = constrain_r

        def gather(tvec):
            return constrain_e(tvec[self.conn_pad])

        def scatter_add(evec):
            out = jnp.zeros((nn, 3), dtype=evec.dtype)
            out = out.at[self.conn_pad.reshape(-1)].add(evec.reshape(-1, 3))
            return constrain_r(out)

        self._gather = gather
        self._scatter_add = scatter_add

        # -- component-major hot path (TPU tile-padding-free layouts) -----
        # Element/point batch axes LAST everywhere (see fem/geometry.py);
        # eligible for the EA/FULL + ECMech staggered-cm configuration.
        self.use_cm = (not self.bbar and self.assembly != Assembly.PA
                       and getattr(model, "supports_cm", False)
                       and os.environ.get("EXACONSTIT_TPU_NO_CM") != "1")
        conn_T = np.asarray(conn).T  # (nen, ne_pad)
        self.conn_T = jnp.asarray(conn_T)

        def shard_cm(ndim):
            """Sharding for CM arrays: element axis (last) split."""
            if device_mesh is None:
                return None
            from jax.sharding import NamedSharding, PartitionSpec
            return NamedSharding(
                device_mesh, PartitionSpec(*([None] * (ndim - 1) + ["elems"])))

        if _place_consts:
            self.conn_T = jax.device_put(self.conn_T, shard_cm(2))

        def constrain_cm(x):
            s = shard_cm(x.ndim)
            if s is not None:
                return jax.lax.with_sharding_constraint(x, s)
            return x

        self._constrain_cm = constrain_cm

        def gather_cm(tvec):
            """Flat (3*nn,) CM nodal field -> (3, nen, ne) element vectors.

            Nodal vectors live as flat component-planes [vx | vy | vz] on
            device: an (nn, 3) array would be stored (8, 128)-tiled on TPU
            with its minor dim padded 3 -> 128 (42.7x HBM waste — the
            round-2 production-size OOM); a flat vector tiles cleanly and
            the (3, nn) reshape here is a free bitcast."""
            return constrain_cm(tvec.reshape(3, nn)[:, self.conn_T])

        def scatter_add_cm(evec_cm):
            """(3, nen, ne) -> flat (3*nn,) CM scatter-add."""
            out = jnp.zeros((3, nn), dtype=evec_cm.dtype)
            out = out.at[:, self.conn_T.reshape(-1)].add(
                evec_cm.reshape(3, -1))
            return constrain_r(out.reshape(-1))

        # Structured (voxel-brick) meshes: the E<->T maps are pure strided
        # slices — no index gather and, critically, no sort-based TPU
        # scatter.  Each local node (li, lj, lk) of every element touches
        # the nodal grid at a fixed stride-p offset, so gather = (p+1)^3
        # strided slices and scatter-add = (p+1)^3 dense slice-adds.
        struct = getattr(self.fes.mesh, "structure", None)
        self.use_struct = (self.use_cm and struct is not None
                           and ne_pad == ne_real and device_mesh is None
                           and os.environ.get(
                               "EXACONSTIT_TPU_NO_STRUCT") != "1")
        if self.use_struct:
            snx, sny, snz = struct
            p = self.fes.mesh.order
            npx, npy, npz = snx * p + 1, sny * p + 1, snz * p + 1
            loff = [(li, lj, lk)
                    for lk in range(p + 1) for lj in range(p + 1)
                    for li in range(p + 1)]  # conn's local lex order

            def sl(o, n):
                return slice(o, o + (n - 1) * p + 1, p)

            def gather_cm(tvec):
                x3 = tvec.reshape(3, npz, npy, npx)
                panels = [x3[:, sl(lk, snz), sl(lj, sny),
                             sl(li, snx)].reshape(3, -1)
                          for (li, lj, lk) in loff]
                return jnp.stack(panels, axis=1)  # (3, nen, ne)

            def scatter_add_cm(evec_cm):
                out = jnp.zeros((3, npz, npy, npx), dtype=evec_cm.dtype)
                f = evec_cm.reshape(3, len(loff), snz, sny, snx)
                for a, (li, lj, lk) in enumerate(loff):
                    out = out.at[:, sl(lk, snz), sl(lj, sny),
                                 sl(li, snx)].add(f[:, a])
                return out.reshape(-1)

        self._gather_cm = gather_cm
        self._scatter_add_cm = scatter_add_cm

        def compute_nsub(v, x_beg, dt):
            """Frozen per-point substep counts from the entry velocity.

            Evaluated ONCE per time step (and per auto-dt attempt): an
            iterate-dependent count makes the residual discontinuous
            where a point's deff crosses a cap/dt multiple, which stalls
            the outer Newton."""
            if self.use_cm:
                # the identified law is point-uniform: no geometry needed
                n = model.substep_counts(dt) \
                    if hasattr(model, "substep_counts") else None
                return jnp.ones((), jnp.int32) if n is None else n
            el_x = gather(x_beg + dt * v)
            el_v = gather(v)
            J = jacobians(el_x, self.dshape)
            vgrad = grad_calc(el_v, self.dshape, J)
            ne, nq = vgrad.shape[0], vgrad.shape[1]
            if hasattr(model, "substep_counts"):
                return model.substep_counts(dt, vgrad.reshape(ne * nq, 3, 3))
            return jnp.ones(ne * nq, dtype=jnp.int32)

        self._compute_nsub = jax.jit(compute_nsub)
        self._compute_nsub_raw = compute_nsub

        def setup_fn(v, x_beg, state_beg, dt, ess_mask, advance_coords,
                     nsub, x_warm, warm_ok):
            """Residual + gradient data + diagonal at velocity iterate v.

            ``x_warm``/``warm_ok`` (material-solve warm start) are
            accepted for interface uniformity with setup_fn_cm; the
            point-major path (UMAT / experimental knobs) ignores them
            and passes the candidate through unchanged."""
            x_end = x_beg + dt * v if advance_coords else x_beg
            el_x = gather(x_end)
            el_v = gather(v)
            J = jacobians(el_x, self.dshape)
            vgrad = grad_calc(el_v, self.dshape, J)
            ne, nq = vgrad.shape[0], vgrad.shape[1]
            stress, state_end, c6 = model.model_setup(
                dt, vgrad.reshape(ne * nq, 3, 3),
                state_beg.reshape(ne * nq, -1), nsub=nsub)
            stress_q = constrain_e(stress.reshape(ne, nq, 6))
            c6_q = constrain_e(c6.reshape(ne, nq, 6, 6))
            if self.bbar:
                force = ops.residual_force_bbar(el_x, self.dshape, self.qwts,
                                                stress_q)
            else:
                force = ops.residual_force(el_x, self.dshape, self.qwts,
                                           stress_q)
            force = force * self.elem_mask[:, None, None]
            r = scatter_add(force).reshape(-1)
            r = jnp.where(ess_mask.reshape(-1), 0.0, r)
            if self.bbar:
                k_data = ops.assemble_ea_gradient_bbar(
                    el_x, self.dshape, self.qwts, c6_q, dt)
                k_data = k_data * self.elem_mask[:, None, None]
                dloc = ops.ea_diagonal(k_data, ref.nnodes)
            elif self.assembly == Assembly.PA:
                k_data = ops.assemble_pa_gradient(el_x, self.dshape,
                                                  self.qwts, c6_q, dt)
                k_data = k_data * self.elem_mask[:, None, None, None, None,
                                                 None]
                dloc = ops.pa_diagonal(el_x, self.dshape, self.qwts, c6_q, dt)
                dloc = dloc * self.elem_mask[:, None, None]
            else:  # EA covers the reference's EA and FULL paths
                k_data = ops.assemble_ea_gradient(el_x, self.dshape,
                                                  self.qwts, c6_q, dt)
                k_data = k_data * self.elem_mask[:, None, None]
                dloc = ops.ea_diagonal(k_data, ref.nnodes)
            k_data = constrain_e(k_data)
            diag = scatter_add(dloc).reshape(-1)
            diag = jnp.where(ess_mask.reshape(-1), 1.0, diag)
            return (r, k_data, diag, stress_q,
                    state_end.reshape(ne, nq, -1), x_warm)

        def _setup_core_cm(el_x, el_v, state_c, emask_c, dt, nsub, x_warm,
                           warm_ok, con):
            """Element-batch core of the CM setup (geometry -> material ->
            force/EA/diagonal).  ``con`` is the sharding-constraint hook
            (identity when running inside a lax.map chunk)."""
            from .fem.geometry import (adjugate_3x3_cm, det_3x3_cm,
                                       grad_calc_cm, jacobians_cm)
            J = jacobians_cm(el_x, self.dshape)
            adj = adjugate_3x3_cm(J)
            det = det_3x3_cm(J)
            L = grad_calc_cm(el_v, self.dshape, adj, det)  # (3, 3, nq, ne)
            nq, ne = L.shape[2], L.shape[3]
            stress, state_end, c6, x_sol = model.model_setup_cm(
                dt, L.reshape(3, 3, nq * ne), state_c, nsub=nsub,
                x_warm=x_warm, warm_ok=warm_ok, with_solution=True)
            stress_q = con(stress.reshape(6, nq, ne))
            c6_q = con(c6.reshape(6, 6, nq, ne))
            force = ops.residual_force_cm(el_x, self.dshape, self.qwts,
                                          stress_q)
            force = force * emask_c[None, None, :]
            if self._ea_asm_f32 and el_x.dtype == jnp.float64:
                # compute the 24x24 EA block build ITSELF in f32: the
                # setup-phase split (scripts/identification/
                # setup_phase_split.py) measured this assembly at 59% of
                # the fused setup in emulated f64, while its consumers
                # are f32 already (the mixed-precision Krylov inner loop)
                # or tolerance-insensitive (the Jacobi diagonal).  The
                # f64 residual replay in pcg_refined accumulates in f64
                # against the f32-block operator — inexact Newton with a
                # ~1e-7-relative Jacobian, the same configuration the
                # 64^3 capacity path validated at 6e-9 solution
                # difference.  The Newton residual r stays full f64, so
                # convergence semantics and golden parity are unchanged.
                f32 = jnp.float32
                k_cm = ops.assemble_ea_gradient_cm(
                    el_x.astype(f32), self.dshape.astype(f32),
                    self.qwts.astype(f32), c6_q.astype(f32),
                    jnp.asarray(dt, f32))
                k_cm = con(k_cm * emask_c[None, None, :].astype(f32))
                dloc = ops.ea_diagonal_cm(k_cm,
                                          ref.nnodes).astype(el_x.dtype)
            else:
                k_cm = ops.assemble_ea_gradient_cm(el_x, self.dshape,
                                                   self.qwts, c6_q, dt)
                k_cm = con(k_cm * emask_c[None, None, :])
                dloc = ops.ea_diagonal_cm(k_cm, ref.nnodes)
                if self._ea_dtype is not None:
                    # store the EA blocks in f32 (the diagonal above is
                    # taken at full precision): halves the largest
                    # resident array at 64^3 (24*24*ne*16 B = 2.4 GB)
                    k_cm = k_cm.astype(self._ea_dtype)
            return force, k_cm, dloc, stress_q, state_end, x_sol

        # Element chunking of the fused setup (production-size meshes):
        # XLA's rematerializer materializes compressed copies of the EA
        # blocks in (3,3)-minor layouts whose TPU tile padding expands
        # 56.9x — at 48^3 that is a 32.8 GB HLO-temp footprint for 742 MB
        # of data (BENCH_r02/r03 OOM dumps).  Bounding the per-chunk
        # element batch keeps every temp small enough that no remat /
        # compression kicks in, while the material solve still sees
        # >=200k-point batches.  Auto policy: ~262k qpts per chunk (the
        # measured-good 32^3 size); single-device only (the SPMD path
        # shards the element axis instead).
        _nq_s = self.fes.nqpts
        env_nc = os.environ.get("EXACONSTIT_SETUP_CHUNKS", "auto")
        if device_mesh is not None:
            self._setup_nc = 1
        else:
            npts_s = ne_pad * _nq_s
            if env_nc == "auto":
                target = max(1, -(-npts_s // 262144))
            else:
                target = max(1, int(env_nc))
            nc = min(target, ne_pad)
            while ne_pad % nc:
                nc -= 1
            self._setup_nc = nc
        # EA-block precision: "auto" stores the per-element stiffness in
        # f32 above 1.5M qpts (under x64), where the f64-emulated block
        # array is the capacity binder (the 64^3 single-chip OOM); the
        # Newton residual stays full f64 so this is standard inexact
        # Newton.  "1"/"0" force it on/off.
        env_f32 = os.environ.get("EXACONSTIT_EA_F32", "auto")
        if env_f32 == "auto":
            ea_f32 = (ne_pad * _nq_s > 1_500_000
                      and jax.config.jax_enable_x64)
        else:
            ea_f32 = env_f32 == "1"
        self._ea_dtype = jnp.float32 if ea_f32 else None
        # EA-ASSEMBLY precision (round-4 verdict item 4): compute the
        # block build in f32, not just store it.  Default on under x64
        # for mixed-precision-capable kinetics (power-law Voce — the
        # same gate as the point solve's f32 stage; MTSDD keeps full-f64
        # assembly to protect its ill-conditioned transition).  Override
        # with EXACONSTIT_EA_ASM_F32=0/1.
        env_asm = os.environ.get("EXACONSTIT_EA_ASM_F32", "auto")
        if env_asm == "auto":
            ea_asm_f32 = (jax.config.jax_enable_x64
                          and getattr(getattr(model, "evptn", None),
                                      "mixed_precision", False))
        else:
            ea_asm_f32 = env_asm == "1"
        self._ea_asm_f32 = ea_asm_f32
        if ea_asm_f32:
            self._ea_dtype = jnp.float32

        def _slice_e(a, e0, nec):
            """Contiguous element chunk [e0, e0+nec) along the last axis."""
            return jax.lax.dynamic_slice_in_dim(a, e0, nec, axis=a.ndim - 1)

        def _upd_e(a, val, e0):
            return jax.lax.dynamic_update_slice_in_dim(a, val, e0,
                                                       axis=a.ndim - 1)

        def setup_fn_cm(v, x_beg, state_beg, dt, ess_mask, advance_coords,
                        nsub, x_warm, warm_ok):
            """Component-major setup: identical math to setup_fn with ALL
            arrays batch-minor — flat (3*nn,) CM nodal vectors, (nsv, npts)
            state, (6, npts) stress — so nothing at the jit boundary or in
            HBM carries TPU tile padding ((ne, nq, 6) pads 6 -> 128 = 21x;
            (ne, nq, nsv) ~5x; (nn, 3) 42.7x — the round-2 64^3 OOM)."""
            x_end = x_beg + dt * v if advance_coords else x_beg
            el_x = gather_cm(x_end)  # (3, nen, ne)
            el_v = gather_cm(v)
            nq, ne = self.fes.nqpts, el_x.shape[2]
            nc = self._setup_nc
            if nc > 1:
                # fori_loop + dynamic_update_slice: each output is
                # allocated ONCE at full size and chunk results are
                # written in place (XLA reuses the loop-carry buffers) —
                # the previous lax.map stacked a (nc, ...) copy of every
                # output that a transposing join then duplicated, ~2x the
                # resident output footprint (the 64^3 OOM margin)
                nec = ne // nc
                nen = el_x.shape[1]
                nsv = state_beg.shape[0]
                st3 = state_beg.reshape(nsv, nq, ne)
                xw3 = x_warm.reshape(8, nq, ne)
                fdt = el_x.dtype
                acc0 = (jnp.zeros((3, nen, ne), fdt),
                        jnp.zeros((3 * nen, 3 * nen, ne),
                                  self._ea_dtype or fdt),
                        jnp.zeros((3, nen, ne), fdt),
                        jnp.zeros((6, nq, ne), fdt),
                        jnp.zeros((nsv, nq, ne), state_beg.dtype),
                        jnp.zeros((8, nq, ne), x_warm.dtype))

                def body(c, acc):
                    e0 = c * nec
                    f_c, k_c, d_c, s_c, se_c, xs_c = _setup_core_cm(
                        _slice_e(el_x, e0, nec), _slice_e(el_v, e0, nec),
                        _slice_e(st3, e0, nec).reshape(nsv, nq * nec),
                        _slice_e(self.elem_mask, e0, nec), dt, nsub,
                        _slice_e(xw3, e0, nec).reshape(8, nq * nec),
                        warm_ok, lambda a: a)
                    return (_upd_e(acc[0], f_c, e0),
                            _upd_e(acc[1], k_c, e0),
                            _upd_e(acc[2], d_c, e0),
                            _upd_e(acc[3], s_c, e0),
                            _upd_e(acc[4], se_c.reshape(nsv, nq, nec), e0),
                            _upd_e(acc[5], xs_c.reshape(8, nq, nec), e0))

                force, k_cm, dloc, stress_q, se3, xs3 = jax.lax.fori_loop(
                    0, nc, body, acc0)
                state_end = se3.reshape(nsv, nq * ne)
                x_sol = xs3.reshape(8, nq * ne)
            else:
                force, k_cm, dloc, stress_q, state_end, x_sol = \
                    _setup_core_cm(el_x, el_v, state_beg, self.elem_mask,
                                   dt, nsub, x_warm, warm_ok, constrain_cm)
            r = scatter_add_cm(force)
            r = jnp.where(ess_mask, 0.0, r)
            diag = scatter_add_cm(dloc)
            diag = jnp.where(ess_mask, 1.0, diag)
            return (r, k_cm, diag, stress_q.reshape(6, nq * ne), state_end,
                    x_sol)

        # checked_jit == jax.jit unless EXACONSTIT_CHECK_NUMERICS=1, which
        # threads checkify NaN checks through the whole fused setup
        self._setup = checked_jit(setup_fn_cm if self.use_cm else setup_fn,
                                  static_argnums=(5,))
        # warm-start carry: this system's setups take (x_warm, warm_ok)
        # and return the converged material-solve vector for the next
        # outer iteration (the slab system keeps the plain interface).
        # warm_start toggles USE of the carry (EXACONSTIT_WARM_START=0
        # reverts to cold starts without recompiling a second program).
        self._warm_arity = True
        self._warm_npts = self.ne_pad * self.fes.nqpts
        self.warm_start = os.environ.get("EXACONSTIT_WARM_START",
                                         "1") != "0"

        def residual_only(v, x_beg, state_beg, dt, ess_mask, nsub,
                          x_warm, warm_ok):
            x_end = x_beg + dt * v
            el_x = gather(x_end)
            el_v = gather(v)
            J = jacobians(el_x, self.dshape)
            vgrad = grad_calc(el_v, self.dshape, J)
            ne, nq = vgrad.shape[0], vgrad.shape[1]
            stress, _, _ = model.model_setup(
                dt, vgrad.reshape(ne * nq, 3, 3),
                state_beg.reshape(ne * nq, -1), compute_tangent=False,
                nsub=nsub)
            stress_q2 = constrain_e(stress.reshape(ne, nq, 6))
            if self.bbar:
                force = ops.residual_force_bbar(el_x, self.dshape, self.qwts,
                                                stress_q2)
            else:
                force = ops.residual_force(el_x, self.dshape, self.qwts,
                                           stress_q2)
            force = force * self.elem_mask[:, None, None]
            r = scatter_add(force).reshape(-1)
            return jnp.where(ess_mask.reshape(-1), 0.0, r)

        def _resid_core_cm(el_x, el_v, state_c, emask_c, dt, nsub, x_warm,
                           warm_ok, con):
            from .fem.geometry import (adjugate_3x3_cm, det_3x3_cm,
                                       grad_calc_cm, jacobians_cm)
            J = jacobians_cm(el_x, self.dshape)
            adj = adjugate_3x3_cm(J)
            det = det_3x3_cm(J)
            L = grad_calc_cm(el_v, self.dshape, adj, det)
            nq, ne = L.shape[2], L.shape[3]
            stress, _, _ = model.model_setup_cm(
                dt, L.reshape(3, 3, nq * ne), state_c,
                compute_tangent=False, nsub=nsub, x_warm=x_warm,
                warm_ok=warm_ok)
            stress_q = con(stress.reshape(6, nq, ne))
            force = ops.residual_force_cm(el_x, self.dshape, self.qwts,
                                          stress_q)
            return force * emask_c[None, None, :]

        def residual_only_cm(v, x_beg, state_beg, dt, ess_mask, nsub,
                             x_warm, warm_ok):
            x_end = x_beg + dt * v
            el_x = gather_cm(x_end)
            el_v = gather_cm(v)
            nq, nc = self.fes.nqpts, self._setup_nc
            if nc > 1:
                ne = el_x.shape[2]
                nec = ne // nc
                nsv = state_beg.shape[0]
                st3 = state_beg.reshape(nsv, nq, ne)
                xw3 = x_warm.reshape(8, nq, ne)
                acc0 = jnp.zeros((3, el_x.shape[1], ne), el_x.dtype)

                def body(c, acc):
                    e0 = c * nec
                    f_c = _resid_core_cm(
                        _slice_e(el_x, e0, nec), _slice_e(el_v, e0, nec),
                        _slice_e(st3, e0, nec).reshape(nsv, nq * nec),
                        _slice_e(self.elem_mask, e0, nec), dt, nsub,
                        _slice_e(xw3, e0, nec).reshape(8, nq * nec),
                        warm_ok, lambda a: a)
                    return _upd_e(acc, f_c, e0)

                force = jax.lax.fori_loop(0, nc, body, acc0)
            else:
                force = _resid_core_cm(el_x, el_v, state_beg,
                                       self.elem_mask, dt, nsub, x_warm,
                                       warm_ok, constrain_cm)
            r = scatter_add_cm(force)
            return jnp.where(ess_mask, 0.0, r)

        if self.use_cm:
            residual_only = residual_only_cm
        self._residual_only = jax.jit(residual_only)

        def max_deff(v, x_beg, dt):
            if self.use_cm:
                from .fem.geometry import (adjugate_3x3_cm, det_3x3_cm,
                                           grad_calc_cm, jacobians_cm)
                el_x = gather_cm(x_beg + dt * v)
                el_v = gather_cm(v)
                J = jacobians_cm(el_x, self.dshape)
                L = grad_calc_cm(el_v, self.dshape, adjugate_3x3_cm(J),
                                 det_3x3_cm(J))  # (3, 3, nq, ne)
                d = 0.5 * (L + jnp.einsum("ij...->ji...", L))
                tr3 = (d[0, 0] + d[1, 1] + d[2, 2]) / 3.0
                dev2 = (jnp.sum(d * d, axis=(0, 1)) - 3.0 * tr3 * tr3)
                deff = jnp.sqrt(2.0 / 3.0 * jnp.maximum(dev2, 0.0))
                return jnp.max(deff * self.elem_mask[None, :])
            el_x = gather(x_beg + dt * v)
            el_v = gather(v)
            J = jacobians(el_x, self.dshape)
            vgrad = grad_calc(el_v, self.dshape, J)
            d = 0.5 * (vgrad + jnp.swapaxes(vgrad, -1, -2))
            d = d - (jnp.trace(d, axis1=-2, axis2=-1) / 3.0)[..., None, None] \
                * jnp.eye(3)
            deff = jnp.sqrt(2.0 / 3.0 * jnp.sum(d * d, axis=(-2, -1)))
            return jnp.max(deff * self.elem_mask[:, None])

        self._max_deff = jax.jit(max_deff)

        def apply_k(k_data, x):
            """K u action (flat (3*nn,) CM field, or (nn, 3) point-major)."""
            if self.use_cm:
                el_y = ops.apply_ea_gradient_cm(k_data, gather_cm(x))
                return scatter_add_cm(el_y)
            el_u = gather(x)
            if self.assembly == Assembly.PA:
                el_y = ops.apply_pa_gradient(
                    k_data, self.dshape.astype(el_u.dtype), el_u)
            else:
                el_y = ops.apply_ea_gradient(k_data, el_u)
            return scatter_add(el_y)

        def grad_matvec(k_data, x_flat, ess_mask_flat):
            """y = K x with essential-dof identity rows/cols."""
            x = jnp.where(ess_mask_flat, 0.0, x_flat)
            if not self.use_cm:
                x = x.reshape(nn, 3)
            y = apply_k(k_data, x).reshape(-1)
            return jnp.where(ess_mask_flat, x_flat, y)

        def grad_matvec_unconstrained(k_data, x_flat):
            x = x_flat if self.use_cm else x_flat.reshape(nn, 3)
            return apply_k(k_data, x).reshape(-1)

        self._grad_matvec_unconstrained = jax.jit(grad_matvec_unconstrained)

        self._grad_matvec = grad_matvec
        self._mesh = mesh
        self.rebuild_krylov(os.environ.get(
            "EXACONSTIT_PRECOND", getattr(opt, "krylov_precond", "jacobi")))
        self._setup_raw = setup_fn_cm if self.use_cm else setup_fn

        def vol_avg(values_q, el_x, divide):
            """Volume-weighted average (or integral) of a qpt field.

            Layout-dispatching: CM values (k, nq, ne) with el_x
            (3, nen, ne); point-major values (ne, nq, k) with el_x
            (ne, nen, 3)."""
            if self.use_cm:
                wts = ops.quad_point_volumes_cm(el_x, self.dshape,
                                                self.qwts)
                wts = wts * self.elem_mask[None, :]
                s = jnp.einsum("qe,kqe->k", wts, values_q)
            else:
                wts = ops.quad_point_volumes(el_x, self.dshape, self.qwts)
                wts = wts * self.elem_mask[:, None]
                s = jnp.einsum("eq,eqk->k", wts, values_q)
            if divide:
                return s / jnp.sum(wts)
            return s

        self._vol_avg = jax.jit(vol_avg, static_argnums=(2,))

        def norm_fn(r):
            return jnp.linalg.norm(r)

        self._norm_raw = norm_fn
        self._norm = jax.jit(norm_fn)

    def rebuild_krylov(self, precond_kind="jacobi"):
        """(Re)build the jitted Krylov solve for a preconditioner choice.

        Separated from __init__ so the preconditioner ("jacobi"/"gmg")
        can be swapped on a live system WITHOUT recompiling the fused
        setup program — the expensive compile at production mesh sizes
        (the bench's GMG-vs-Jacobi A/B reuses one system).

        The GMG preconditioner is the role BoomerAMG plays in the
        reference (src/system_driver.cpp:116-150 — Jacobi-PCG iteration
        counts grow with resolution): a Chebyshev-smoothed V-cycle on
        the voxel hierarchy, single-device CM EA path only.
        """
        opt = self.opt
        mesh = self._mesh
        grad_matvec = self._grad_matvec
        if opt.solver == KrylovSolver.PCG:
            krylov = pcg
        elif opt.solver == KrylovSolver.MINRES:
            krylov = minres
        else:
            krylov = gmres

        # Mixed-precision Krylov (f32 inner PCG + f64 residual replay):
        # f64 is emulated on TPU, but the linear solve only needs f64 at
        # the refinement level — same MFEM convergence criterion, ~f32
        # matvec cost.  Enabled for the PCG path under x64 unless the
        # caller opts out (opt.mixed_krylov = False).
        use_refined = (opt.solver == KrylovSolver.PCG
                       and getattr(opt, "mixed_krylov", True)
                       and jax.config.jax_enable_x64)

        # "auto" (the default) selects GMG where it applies and falls
        # back to Jacobi silently; an explicit "gmg" warns on fallback.
        # Measured at 48^3 (BENCH_r05): GMG converges the linear solves
        # in ~9 iterations where Jacobi-PCG hits the iteration cap
        # unconverged, at 1.07x better step wall time.
        gmg_meta = None
        eligible = (self.use_cm
                    and getattr(mesh, "structure", None) is not None
                    and self.fes.ref.nnodes == 8
                    and opt.solver == KrylovSolver.PCG
                    and self.device_mesh is None)
        if precond_kind in ("gmg", "auto") and eligible:
            from .solvers.gmg import GMGMeta
            meta = GMGMeta(mesh.structure)
            if meta.usable:
                gmg_meta = meta
            elif precond_kind == "gmg":
                print("gmg preconditioner unavailable (grid does not "
                      "coarsen); using Jacobi")
        elif precond_kind == "gmg":
            print("gmg preconditioner requires the single-device CM EA "
                  "path on a structured order-1 mesh; using Jacobi")
        ne_real = self.fes.num_elems
        self.precond_kind = "gmg" if gmg_meta is not None else "jacobi"

        def krylov_solve(k_data, diag, b, ess_mask_flat):
            matvec = lambda x: grad_matvec(k_data, x, ess_mask_flat)
            dinv = 1.0 / diag
            precond = lambda v: dinv * v
            if use_refined and b.dtype == jnp.float64:
                f32 = jnp.float32
                k32 = jax.tree_util.tree_map(lambda a: a.astype(f32),
                                             k_data)
                dinv32 = dinv.astype(f32)
                matvec32 = lambda x: grad_matvec(k32, x, ess_mask_flat)
                precond32 = lambda v: dinv32 * v
                if gmg_meta is not None:
                    from .solvers import gmg as _gmg
                    levels = _gmg.build_hierarchy(
                        gmg_meta, k32[:, :, :ne_real],
                        ess_mask_flat, matvec32, diag.astype(f32))
                    cd = gmg_meta.coarse_dense
                    precond32 = lambda v: _gmg.v_cycle(levels, v,
                                                       coarse_dense=cd)
                    precond = lambda v: _gmg.v_cycle(
                        levels, v.astype(f32),
                        coarse_dense=cd).astype(b.dtype)
                return pcg_refined(matvec, precond, matvec32, precond32, b,
                                   opt.krylov_rel_tol, opt.krylov_abs_tol,
                                   opt.krylov_iter)
            if gmg_meta is not None:
                from .solvers import gmg as _gmg
                levels = _gmg.build_hierarchy(
                    gmg_meta, k_data[:, :, :ne_real], ess_mask_flat,
                    matvec, diag)
                precond = lambda v: _gmg.v_cycle(
                    levels, v, coarse_dense=gmg_meta.coarse_dense)
            return krylov(matvec, precond, b, opt.krylov_rel_tol,
                          opt.krylov_abs_tol, opt.krylov_iter)

        self._krylov = jax.jit(krylov_solve)
        self._krylov_raw = krylov_solve

    def _warm_zeros(self, dtype):
        """Cold warm-start carry (component-major solution layout)."""
        return jnp.zeros((8, self._warm_npts), dtype)

    # -- layout adapters (jit-boundary contract) -----------------------------
    # With use_cm the device-resident contract is: nodal vectors flat
    # (3*nn,) component-planes, state (nsv, nq*ne_pad), stress (6, npts),
    # ess masks flat (3*nn,) — every minor axis is a big batch dim, so no
    # array at rest or at the jit boundary pays TPU tile padding.  Host
    # code converses in the reference's point-major shapes through these
    # adapters (host np transposes, once per step at most).

    def _put_r(self, a):
        return a if self._shard_r is None else jax.device_put(a,
                                                              self._shard_r)

    def _put_cm(self, a):
        if self.device_mesh is None:
            return a
        from jax.sharding import NamedSharding, PartitionSpec
        s = NamedSharding(self.device_mesh,
                          PartitionSpec(*([None] * (a.ndim - 1) + ["elems"])))
        return jax.device_put(a, s)

    def _put_e(self, a):
        return a if self._shard_e is None else jax.device_put(a,
                                                              self._shard_e)

    def to_node(self, arr):
        """Host (nn, 3) nodal field -> device array in the system layout."""
        a = np.asarray(arr)
        return self._put_r(jnp.asarray(a.T.reshape(-1) if self.use_cm
                                       else a))

    def _fetch(self, dev):
        """Device array -> host np, multi-process safe.

        Element-sharded arrays (PartitionSpec 'elems') are not fully
        addressable when jax.process_count() > 1; gather them first
        (collective — every process must reach this call, mirroring the
        reference where every rank participates in the reductions and
        only rank 0 writes, system_driver.cpp:461-548)."""
        if not getattr(dev, "is_fully_addressable", True):
            from jax.experimental import multihost_utils
            dev = multihost_utils.process_allgather(dev, tiled=True)
        return np.asarray(dev)

    def from_node(self, dev):
        """Device nodal field -> host np (nn, 3)."""
        a = self._fetch(dev)
        return a.reshape(3, -1).T if self.use_cm else a

    def to_ess(self, mask):
        """(nn, 3) bool mask -> flat device mask in the system dof order."""
        m = np.asarray(mask)
        return self._put_r(jnp.asarray(m.T.reshape(-1) if self.use_cm
                                       else m.reshape(-1)))

    def to_state(self, pm):
        """Host (ne_pad, nq, k) qpt field -> device system layout."""
        a = np.asarray(pm)
        if self.use_cm:
            return self._put_cm(jnp.asarray(
                a.transpose(2, 1, 0).reshape(a.shape[2], -1)))
        return self._put_e(jnp.asarray(a))

    def from_state(self, dev):
        """Device qpt field -> host np (ne_pad, nq, k)."""
        a = self._fetch(dev)
        if self.use_cm:
            return a.reshape(a.shape[0], self.fes.nqpts,
                             self.ne_pad).transpose(2, 1, 0)
        return a

    # stress shares the (k, npts) <-> (ne, nq, k) transform
    to_stress = to_state
    from_stress = from_state

    def zeros_stress(self, dtype=None):
        if self.use_cm:
            return self._put_cm(jnp.zeros(
                (6, self.fes.nqpts * self.ne_pad), dtype=dtype))
        return self._put_e(jnp.zeros((self.ne_pad, self.fes.nqpts, 6),
                                     dtype=dtype))

    def _ess_flat(self, ess_mask):
        """Accept an (nn, 3) host mask or an already-flat device mask."""
        if getattr(ess_mask, "ndim", 2) == 1:
            return jnp.asarray(ess_mask)
        return self.to_ess(ess_mask)

    def _unflat_c(self, c):
        """Krylov correction (flat) -> the nodal-field layout."""
        return c if self.use_cm else c.reshape(-1, 3)

    def _timed(self, name, fn, *args):
        """Run fn; when region accounting is on, block + record wall time
        (the analog of the reference's CALI_MARK_BEGIN/END pairs around
        NR/Krylov/material phases, src/mechanics_log.hpp)."""
        if self.regions is None:
            return fn(*args)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        self.regions.mark(name, time.perf_counter() - t0)
        return out

    def make_jit_step(self, newton_iters=2):
        """One fully-jitted time step (fixed Newton iteration count).

        Used by the multi-chip dry run and throughput benchmarks; the
        production driver uses the host-orchestrated adaptive Newton.
        """

        warm = getattr(self, "_warm_arity", False)

        def step(v, x_beg, state, dt, ess_flat):
            nsub = self._compute_nsub_raw(v, x_beg, dt)

            if warm:
                xw0 = self._warm_zeros(state.dtype)
                ok0 = jnp.asarray(False)

                use_warm = getattr(self, "warm_start", True)

                def newton_body(_, carry):
                    v, xw, ok = carry
                    r, kd, dg, _, _, xs = self._setup_raw(
                        v, x_beg, state, dt, ess_flat, True, nsub, xw, ok)
                    c, _, _, _ = self._krylov_raw(kd, dg, r, ess_flat)
                    return (v - self._unflat_c(c), xs,
                            jnp.asarray(use_warm))

                v, xw, ok = jax.lax.fori_loop(0, newton_iters, newton_body,
                                              (v, xw0, ok0))
                r, kd, dg, stress, state_end, _ = self._setup_raw(
                    v, x_beg, state, dt, ess_flat, True, nsub, xw, ok)
            else:
                def newton_body(_, v):
                    r, kd, dg, _, _ = self._setup_raw(v, x_beg, state, dt,
                                                      ess_flat, True, nsub)
                    c, _, _, _ = self._krylov_raw(kd, dg, r, ess_flat)
                    return v - self._unflat_c(c)

                v = jax.lax.fori_loop(0, newton_iters, newton_body, v)
                r, kd, dg, stress, state_end = self._setup_raw(
                    v, x_beg, state, dt, ess_flat, True, nsub)
            x_cur = x_beg + dt * v
            return v, x_cur, stress, state_end, self._norm_raw(r)

        return jax.jit(step)

    # -- Newton solve (host loop) -------------------------------------------
    def newton_solve(self, v, x_beg, state, dt, ess_mask, verbose=True):
        """Newton-Krylov with quadratic line-search safeguarding.

        Semantics: NR follows the reference's plain Newton
        (ExaNewtonSolver::Mult) but falls back to the 3-point quadratic
        line search of ExaNewtonLSSolver (mechanics_solver.cpp:219-257)
        whenever a full step fails to halve the residual — the crystal
        power-law makes the elastic-plastic transition nearly
        rate-independent, and plain full/half stepping stagnates there.
        The converged solution is identical either way.  NRLS always
        line-searches (the reference's behavior).
        """
        opt = self.opt
        ess_flat = self._ess_flat(ess_mask)
        # substep counts frozen at step entry (smooth residual over NR)
        nsub = self._compute_nsub(v, x_beg, dt)
        warm = getattr(self, "_warm_arity", False)
        if warm:
            # material-solve warm start: carry the converged per-point
            # solution vector between outer iterations (cold on entry)
            xw = self._warm_zeros(state.dtype)
            ok = jnp.asarray(False)

            def _do_setup(v_it):
                out = self._timed("operator_setup", self._setup, v_it,
                                  x_beg, state, dt, ess_flat, True, nsub,
                                  xw, ok)
                return out

            def _do_resid(v_it):
                return self._timed("line_search", self._residual_only,
                                   v_it, x_beg, state, dt, ess_flat, nsub,
                                   xw, ok)
        else:
            def _do_setup(v_it):
                return self._timed("operator_setup", self._setup, v_it,
                                   x_beg, state, dt, ess_flat, True, nsub)

            def _do_resid(v_it):
                return self._timed("line_search", self._residual_only,
                                   v_it, x_beg, state, dt, ess_flat, nsub)

        out = _do_setup(v)
        r, k_data, diag, stress, state_end = out[:5]
        if warm and self.warm_start:
            xw, ok = out[5], jnp.asarray(True)
        norm = float(self._norm(r))
        norm0 = norm
        norm_max = max(opt.newton_rel_tol * norm0, opt.newton_abs_tol)
        it = 0
        kiters = []  # Krylov iterations per NR iteration (observability)
        kconv = []  # per-solve converged flags (a capped solve is visible)
        krelres_l = []  # achieved residual reduction per linear solve
        converged = False
        always_ls = opt.nl_solver == NLSolver.NRLS
        while True:
            if not np.isfinite(norm):
                break
            if verbose:
                print(f"  Newton iteration {it:2d} : ||r|| = {norm:.6e}" +
                      (f", ||r||/||r_0|| = {norm/norm0:.6e}" if it else ""))
            if norm <= norm_max:
                converged = True
                break
            if it >= opt.newton_iter:
                break
            c, kit, kdone, krelres = self._timed(
                "krylov_solve", self._krylov, k_data, diag, r, ess_flat)
            kiters.append(int(kit))
            kconv.append(bool(kdone))
            krelres_l.append(float(krelres))
            c = self._unflat_c(c)
            q1 = norm

            def quad_ls():
                r3 = _do_resid(v - c)
                q3 = float(self._norm(r3))
                r2 = _do_resid(v - 0.5 * c)
                q2 = float(self._norm(r2))
                denom = q1 - 2.0 * q2 + q3
                eps = (3.0 * q1 - 4.0 * q2 + q3) / (4.0 * denom) \
                    if denom != 0 else 1.0
                if denom > 0 and 0 < eps < 1:
                    return eps
                if q3 < q1:
                    return 1.0
                return 0.05

            # drop the previous iteration's large arrays before building
            # the next setup: otherwise the old EA blocks/state_end stay
            # resident across the new setup call and the peak footprint
            # carries two full gradient sets (they are all reassigned
            # from `out` right below)
            r = k_data = diag = stress = state_end = out = None
            if always_ls:
                scale = quad_ls()
                v_new = v - scale * c
                out = _do_setup(v_new)
            else:
                v_new = v - c
                out = _do_setup(v_new)
                q_full = float(self._norm(out[0]))
                if not np.isfinite(q_full) or q_full > 0.5 * q1:
                    scale = quad_ls()
                    if scale != 1.0:
                        v_new = v - scale * c
                        out = _do_setup(v_new)

            v = v_new
            r, k_data, diag, stress, state_end = out[:5]
            if warm and self.warm_start:
                xw, ok = out[5], jnp.asarray(True)
            norm = float(self._norm(r))
            it += 1

        # per-solve observability record (the reference's Caliper regions
        # + Newton norm prints, mechanics_solver.cpp:79-86): NR count and
        # Krylov iterations per NR iteration, consumed by bench.py and
        # the timing log
        self.last_newton_stats = {
            "nr_iters": it, "krylov_iters": kiters,
            "krylov_converged": kconv, "krylov_relres": krelres_l,
            "norm0": norm0, "norm": norm,
        }
        return v, stress, state_end, converged, it, norm

    # -- BC-change corrector (SystemDriver::SolveInit) ----------------------
    def solve_init(self, v_prev, v_new, x_beg, state, dt, ess_mask):
        ess_flat = self._ess_flat(ess_mask)
        delta = jnp.where(ess_flat, (v_new - v_prev).reshape(-1), 0.0)
        # local (unconstrained) gradient action on the BC delta + residual,
        # with geometry NOT advanced (Setup<false>,
        # mechanics_operator.cpp:446-483)
        nsub = self._compute_nsub(v_prev, x_beg, dt)
        if getattr(self, "_warm_arity", False):
            r, k_data, diag = self._setup(
                v_prev, x_beg, state, dt, ess_flat, False, nsub,
                self._warm_zeros(state.dtype), jnp.asarray(False))[:3]
        else:
            r, k_data, diag, _, _ = self._setup(v_prev, x_beg, state, dt,
                                                ess_flat, False, nsub)
        y = self._grad_matvec_unconstrained(k_data, delta)
        y = jnp.where(ess_flat, 0.0, y) + r
        c, kit, kdone, _ = self._krylov(k_data, diag, y, ess_flat)
        return v_prev - self._unflat_c(c)


# ----------------------------------------------------------------------------
# Simulation driver (main time loop)
# ----------------------------------------------------------------------------

class Simulation:
    def __init__(self, opt: ExaOptions, workdir: str | None = None,
                 device_mesh=None):
        self.opt = opt
        self.workdir = workdir or os.getcwd()
        self.device_mesh = device_mesh

        # ---- mesh (mechanics_driver.cpp:236-317) ----
        if opt.mesh_type.value == "auto":
            gpath = opt.abspath(opt.grain_map)
            if opt.cp and os.path.exists(gpath):
                gmap = np.loadtxt(gpath).reshape(-1)
            else:
                gmap = None
            self.mesh = make_cartesian_mesh(
                opt.nxyz, opt.mxyz, order=opt.order, grain_map=gmap,
                ref_levels=opt.ser_ref_levels + opt.par_ref_levels)
        else:
            from .mesh.mfem_io import read_mfem_mesh
            self.mesh = read_mfem_mesh(opt.abspath(opt.mesh_file),
                                       ref_levels=opt.ser_ref_levels +
                                       opt.par_ref_levels,
                                       order=opt.order)

        props = np.loadtxt(opt.abspath(opt.props_file)).reshape(-1)
        assert props.size == opt.nProps
        self.props = props
        if opt.mech_type == MechType.UMAT:
            from .models.umat import UmatLibrary, UmatModel
            # crystal UMATs carry the per-grain orientation rows inside the
            # state-variable array (setStateVarData splice, see below)
            self._ori_stride = {OriType.QUAT: 4, OriType.EULER: 3}.get(
                opt.ori_type, opt.grain_custom_stride) if opt.cp else 0
            self.model = UmatModel(lib=UmatLibrary(opt.abspath(
                opt.umat_library)), props=props,
                num_user_state=opt.numStateVars + self._ori_stride,
                temp_k=opt.temp_k)
        else:
            self.model = build_model(opt, props)
        # ---- system selection (domain decomposition) ----
        # Every reference run is domain-decomposed (ParMesh,
        # mechanics_driver.cpp:312-315).  With >1 device the production
        # default is the slab halo-exchange partition (O(surface) comm
        # per matvec, parallel/slab_system.py); replicated-node sharding
        # is the fallback for configurations the slab path does not
        # cover (non-axis-ordered meshes, non-PCG Krylov, UMAT).
        mode = getattr(opt, "parallel_mode", "auto")
        system = None
        self.parallel_mode = "single"
        # Slab works single- and multi-process: the device mesh spans all
        # processes' devices (the mpirun analog), halo exchange rides the
        # same ppermute, and host-side fetches of the block-sharded
        # arrays gather collectively (MechSystem._fetch), so every
        # process executes the same SPMD program — matching the
        # reference, whose only distributed mode is MPI domain
        # decomposition (SURVEY.md section 2.3).
        if device_mesh is not None and mode in ("auto", "slab") \
                and opt.mech_type == MechType.EXACMECH \
                and opt.solver == KrylovSolver.PCG:
            from .parallel.slab_system import SlabMechSystem
            try:
                system = SlabMechSystem(opt, self.mesh, self.model,
                                        device_mesh)
                self.parallel_mode = "slab"
            except ValueError as e:
                if mode == "slab":
                    raise
                print(f"slab partition unavailable ({e}); using "
                      "replicated-node element sharding")
        elif device_mesh is not None and mode == "slab":
            raise ValueError(
                "Solvers.parallel_mode = 'slab' requires an ExaCMech "
                "material and the PCG Krylov solver (got "
                f"mech_type={opt.mech_type.name}, "
                f"solver={opt.solver.name})")
        if system is None:
            system = MechSystem(opt, self.mesh, self.model,
                                device_mesh=device_mesh)
            if device_mesh is not None:
                self.parallel_mode = "replicated"
        self.system = system
        fes = self.system.fes
        nq = fes.nqpts

        if opt.mech_type == MechType.UMAT:
            # setStateVarData semantics (mechanics_driver.cpp:1058-1154):
            # the state file provides numStateVars values broadcast to all
            # points; for crystal UMATs (cp=true) the per-grain orientation
            # rows (width = ori stride) are spliced in at
            # grain_statevar_offset (ori_state_var_loc; <0 = end, 0 = front).
            sv = np.loadtxt(opt.abspath(opt.state_file)).reshape(-1)
            assert sv.size == opt.numStateVars, (
                f"state file has {sv.size} values, expected "
                f"{opt.numStateVars}")
            if opt.cp:
                ori = np.loadtxt(opt.abspath(opt.ori_file)).reshape(
                    opt.ngrains, self._ori_stride)
                loc = opt.grain_statevar_offset
                if loc < 0:
                    per_grain = np.concatenate(
                        [np.tile(sv, (opt.ngrains, 1)), ori], axis=1)
                else:
                    per_grain = np.concatenate(
                        [np.tile(sv[:loc], (opt.ngrains, 1)), ori,
                         np.tile(sv[loc:], (opt.ngrains, 1))], axis=1)
                grain_ids = self.mesh.elem_attr.astype(int) - 1
                statev0 = np.repeat(per_grain[grain_ids], nq, axis=0)
            else:
                statev0 = np.tile(sv, (fes.num_elems * nq, 1))
            state0 = self.model.init_state(npts=fes.num_elems * nq)
            state0[:, 15:] = statev0
        else:
            # ---- orientations -> per-element quats ----
            ori = np.loadtxt(opt.abspath(opt.ori_file)).reshape(-1)
            if opt.ori_type == OriType.QUAT:
                quats = ori.reshape(opt.ngrains, 4)
                # normalize (reference files are unit but be safe)
                quats = quats / np.linalg.norm(quats, axis=1, keepdims=True)
            elif opt.ori_type == OriType.EULER:
                quats = _euler_to_quat(ori.reshape(opt.ngrains, 3))
            elif opt.ori_type == OriType.CUSTOM and \
                    opt.grain_custom_stride == 4 and \
                    opt.grain_statevar_offset == self.model.IND_QUATS:
                # custom stride landing exactly on the model's quaternion
                # slot (mechanics_driver.cpp:417-420 + the ExaCMech history
                # layout) is just quaternion data by another name
                quats = ori.reshape(opt.ngrains, 4)
                quats = quats / np.linalg.norm(quats, axis=1, keepdims=True)
            else:
                raise ValueError(
                    "ExaCMech models require quaternion orientation data "
                    "in the history quaternion slot; got ori_type="
                    f"{opt.ori_type} stride={opt.grain_custom_stride} "
                    f"loc={opt.grain_statevar_offset}")
            grain_ids = self.mesh.elem_attr.astype(int) - 1
            elem_quats = quats[grain_ids]  # (nelems, 4)
            pt_quats = np.repeat(elem_quats, nq, axis=0)
            state0 = self.model.init_state(pt_quats)
        # Note on the state-vars file for ExaCMech models: the reference
        # runs setStateVarData (mechanics_driver.cpp:510) but then
        # ECMechXtalModel::init_state_vars (mechanics_ecmech.hpp:249-300)
        # overwrites every history slot EXCEPT the quaternion splice with
        # histInit values -- i.e. only the orientation survives.  Loading
        # quats from the ori file and the rest from the model's own
        # init_state reproduces that exactly; the file's non-orientation
        # values are intentionally ignored here too (UMAT models, which
        # keep them, splice them in above).
        state0 = state0.reshape(fes.num_elems, nq, -1)
        ne_pad = self.system.ne_pad
        if ne_pad > fes.num_elems:
            pad = np.tile(state0[:1], (ne_pad - fes.num_elems, 1, 1))
            state0 = np.concatenate([state0, pad], axis=0)
        # device-resident fields live in the system's jit-boundary layout
        # (flat CM nodal vectors / (k, npts) qpt fields on the CM path)
        self.state = self.system.to_state(state0)
        self.stress = self.system.zeros_stress()

        # ---- coordinates / velocity ----
        self.x_ref = self.system.to_node(self.mesh.coords)
        self.x_beg = self.x_ref
        self.x_cur = self.x_ref
        self.v = jnp.zeros_like(self.x_ref)

        # ---- time stepping ----
        if opt.dt_cust:
            dts = np.loadtxt(opt.abspath(opt.dt_file)).reshape(-1)
            assert dts.size >= opt.nsteps
            self.cust_dt = dts[:opt.nsteps]
            self.t_final = float(self.cust_dt.sum())
            self.nsteps = opt.nsteps
        else:
            self.cust_dt = None
            self.t_final = opt.t_final
            self.nsteps = int(np.ceil(opt.t_final / opt.dt_min))
        self.dt_auto_cur = opt.dt  # auto stepping state

        # ---- BC epochs ----
        self.bc_steps = {s: resolve_step_bcs(opt, fes, s)
                         for s in opt.updateStep}
        self.update_steps = set(opt.updateStep)
        self.cur_bcs = self.bc_steps[1]

        self.step_times = []
        self.vis_entries = []
        self.visualize = (opt.visit or opt.conduit or opt.paraview
                          or opt.adios2)

    # -- UpdateVelocity (system_driver.cpp:327-427) -------------------------
    def update_velocity(self):
        bcs = self.cur_bcs
        sysm = self.system
        v = sysm.from_node(self.v).copy()
        if bcs.has_vel:
            v[bcs.vel_nodes] = bcs.vel_values
        if bcs.has_vgrad:
            x = sysm.from_node(self.x_cur)
            if self.opt.vgrad_origin_flag:
                origin = np.asarray(self.opt.vgrad_origin)
            else:
                origin = x.min(axis=0)
            v_full = (x - origin) @ bcs.vgrad.T
            mask = bcs.vgrad_mask
            v[mask] = v_full[mask]
        self.v = sysm.to_node(v)

    # -- one time step -------------------------------------------------------
    def advance(self, ti, dt, verbose=True):
        opt = self.opt
        sysm = self.system
        x_sub = None  # composed end coordinates from a subdivided solve

        # BC-change corrector; the reference runs this at step 1 as well
        # (update_steps always contains 1, mechanics_driver.cpp:866-878)
        if ti in self.update_steps:
            if verbose and ti != 1:
                print(f"Changing boundary conditions this step: {ti}")
            v_prev = self.v
            self.cur_bcs = self.bc_steps[ti]
            self.update_velocity()
            self.v = sysm.solve_init(v_prev, self.v, self.x_beg, self.state,
                                     dt, self.cur_bcs.ess_mask)

        self.update_velocity()

        if opt.dt_auto:
            dt_old = dt
            v_save = self.v
            attempts = 0
            while True:
                v, stress, state_end, conv, nit, fnorm = sysm.newton_solve(
                    self.v, self.x_beg, self.state, dt,
                    self.cur_bcs.ess_mask, verbose)
                if conv or attempts >= 2:
                    break
                print("WARNING: Solution did not converge; decreasing dt")
                self.v = v_save
                dt = max(dt * opt.dt_scale, opt.dt_min)
                attempts += 1
            if not conv:
                raise RuntimeError("Newton Solver did not converge.")
            # grow dt for the next step (system_driver.cpp:264-274)
            niter_scale = opt.newton_iter * opt.dt_scale
            factor = niter_scale / max(nit, 1)
            self.dt_auto_cur = max(dt * factor, opt.dt_min)
            self._append_file(opt.dt_file, f"{dt:.12g}\n")
        else:
            v, stress, state_end, conv, nit, fnorm = sysm.newton_solve(
                self.v, self.x_beg, self.state, dt, self.cur_bcs.ess_mask,
                verbose)
            if not conv:
                # The reference hard-aborts on a failed fixed/custom-dt
                # step (MFEM_VERIFY, system_driver.cpp:287-288).  We
                # instead subdivide the step and compose sub-solves --
                # outputs are still reported at the scheduled times, and
                # the essential velocities (rates, constant over the
                # step) compose exactly: x_end = x + sum_k (dt/n) v_k.
                for nsub in (2, 4, 8):
                    if verbose:
                        print(f"WARNING: Newton failed at dt={dt:g}; "
                              f"retrying with {nsub} substeps")
                    got = self._solve_subdivided(dt, nsub, verbose)
                    if got is not None:
                        v, stress, state_end, x_sub = got
                        conv = True
                        break
            if not conv:
                raise RuntimeError("Newton Solver did not converge.")

        self.v = v
        self.x_cur = x_sub if x_sub is not None else self.x_beg + dt * v
        # UpdateModel: swap begin <- end (system_driver.cpp:429-443).
        # state_prev mirrors the post-swap matVars1, which the reference's
        # calcDpMat reads -- so its Dp output lags one step
        # (system_driver.cpp:525 after the :441 swap).
        self.state_prev = self.state
        self.stress = stress
        self.state = state_end
        self.x_beg = self.x_cur
        return dt

    def _solve_subdivided(self, dt, nsub, verbose):
        """Advance one scheduled step as ``nsub`` composed sub-solves.

        Robustness extension over the reference (which aborts): operates
        on locals and commits nothing; returns (v, stress, state_end,
        x_end) on success or None if any sub-solve fails.  Essential
        velocities are rates held constant over the scheduled step, so
        the composed end position is sum_k (dt/nsub) v_k.
        """
        sysm = self.system
        v, x, state = self.v, self.x_beg, self.state
        dts = dt / nsub
        for _ in range(nsub):
            v, stress, state_end, conv, nit, _ = sysm.newton_solve(
                v, x, state, dts, self.cur_bcs.ess_mask, verbose)
            if not conv:
                return None
            x = x + dts * v
            state = state_end
        return v, stress, state, x

    # -- outputs -------------------------------------------------------------
    def _append_file(self, name, text):
        # rank-0 gating: in multi-process (jax.distributed) runs every
        # process executes the collective average computations, but only
        # process 0 touches the shared working directory — matching the
        # reference's my_id == 0 output gating (system_driver.cpp:461-548)
        if jax.process_index() != 0:
            return
        path = os.path.join(self.workdir, name)
        with open(path, "a") as f:
            f.write(text)

    def write_averages(self):
        opt = self.opt
        sysm = self.system
        cm = sysm.use_cm
        nq = sysm.fes.nqpts
        if cm:
            el_x = sysm._gather_cm(self.x_cur)
            stress_q = self.stress.reshape(6, nq, -1)
        else:
            el_x = sysm._gather(self.x_cur)
            stress_q = self.stress
        avg_stress = np.asarray(sysm._vol_avg(stress_q, el_x, True))
        self._append_file(opt.avg_stress_fname,
                          " ".join(f"{v:.6g}" for v in avg_stress) + "\n")
        if opt.additional_avgs:
            if opt.mech_type == MechType.EXACMECH:
                off, _ = self.model.qf_mapping["pl_work"]
                plw_q = (self.state[off:off + 1].reshape(1, nq, -1) if cm
                         else self.state[:, :, off:off + 1])
                plw = np.asarray(sysm._vol_avg(plw_q, el_x, False))
                self._append_file(opt.avg_pl_work_fname, f"{plw[0]:.6g}\n")
            # average deformation gradient F = d x_cur / d X  (column-major
            # 9-vector layout, mechanics_operator.cpp:393-427)
            if cm:
                from .fem.geometry import (adjugate_3x3_cm, det_3x3_cm,
                                           grad_calc_cm, jacobians_cm)
                el_X = sysm._gather_cm(self.x_ref)
                Jref = jacobians_cm(el_X, sysm.dshape)
                F = grad_calc_cm(el_x, sysm.dshape, adjugate_3x3_cm(Jref),
                                 det_3x3_cm(Jref))  # (3, 3, nq, ne)
                Fcols = jnp.stack([F[i, j] for j in range(3)
                                   for i in range(3)])  # (9, nq, ne)
                wts_ref = ops.quad_point_volumes_cm(el_X, sysm.dshape,
                                                    sysm.qwts)
                wts_ref = wts_ref * sysm.elem_mask[None, :]
                favg = np.asarray(jnp.einsum("qe,kqe->k", wts_ref, Fcols)
                                  / jnp.sum(wts_ref))
            else:
                el_X = sysm._gather(self.x_ref)
                Jref = jacobians(el_X, sysm.dshape)
                F = grad_calc(el_x, sysm.dshape, Jref)
                Fcols = jnp.stack([F[..., i, j] for j in range(3)
                                   for i in range(3)], axis=-1)
                wts_ref = ops.quad_point_volumes(el_X, sysm.dshape,
                                                 sysm.qwts)
                wts_ref = wts_ref * sysm.elem_mask[:, None]
                favg = np.asarray(jnp.einsum("eq,eqk->k", wts_ref, Fcols)
                                  / jnp.sum(wts_ref))
            self._append_file(opt.avg_def_grad_fname,
                              " ".join(f"{v:.6g}" for v in favg) + "\n")
            if opt.mech_type == MechType.EXACMECH:
                state_dp = getattr(self, "state_prev", self.state)
                if cm:
                    dp = self.model.dp_mat(state_dp.T)  # (npts, 3, 3)
                    dp9 = jnp.stack([dp[:, i, j] for j in range(3)
                                     for i in range(3)])
                    dp9 = dp9.reshape(9, nq, -1)
                else:
                    ne_, nq_, nsv = state_dp.shape
                    dp = self.model.dp_mat(state_dp.reshape(ne_ * nq_, nsv))
                    dp = dp.reshape(ne_, nq_, 3, 3)
                    dp9 = jnp.stack([dp[..., i, j] for j in range(3)
                                     for i in range(3)], axis=-1)
                dpavg9 = np.asarray(sysm._vol_avg(dp9, el_x, True))
                # (0,4,8,5,2,1) col-major -> svec (system_driver.cpp:537-543)
                dp6 = dpavg9[[0, 4, 8, 5, 2, 1]]
                self._append_file(opt.avg_dp_tensor_fname,
                                  " ".join(f"{v:.6g}" for v in dp6) + "\n")

    # -- main loop (mechanics_driver.cpp:837-968) ----------------------------
    def run(self, verbose=True):
        t = 0.0
        ti = 1
        ckpt_path = os.path.join(self.workdir, self.opt.checkpoint_dir,
                                 "checkpoint.npz")
        if self.opt.restart and os.path.exists(ckpt_path):
            from .io.checkpoint import load_checkpoint
            t, ti_done = load_checkpoint(ckpt_path, self)
            ti = ti_done + 1
            if verbose:
                print(f"restarted from checkpoint at step {ti_done}, "
                      f"t = {t:.6g}")
        while ti <= self.nsteps or (self.opt.dt_auto and
                                    t < self.t_final - 1e-14):
            if self.cust_dt is not None:
                dt = float(self.cust_dt[ti - 1])
            elif self.opt.dt_auto:
                dt = min(self.dt_auto_cur, self.t_final - t)
            else:
                dt = min(self.opt.dt, self.t_final - t)
            if verbose:
                print(f"step {ti}, dt = {dt:.6g}")
            t0 = time.time()
            dt_used = self.advance(ti, dt, verbose)
            self.step_times.append(time.time() - t0)
            t += dt_used
            last = abs(t - self.t_final) <= abs(1e-3 * dt_used)
            self.write_averages()
            if self.opt.checkpoint_steps > 0 and \
                    ti % self.opt.checkpoint_steps == 0:
                from .io.checkpoint import save_checkpoint
                save_checkpoint(ckpt_path, self, t, ti)
            if self.visualize and (last or ti % self.opt.vis_steps == 0):
                from .io.postprocess import write_vis_step
                write_vis_step(self, ti, t, self.vis_entries)
            if verbose:
                print(f"step {ti} done, t = {t:.6g} "
                      f"({self.step_times[-1]:.2f}s)")
            if last:
                break
            ti += 1
        if self.system.regions is not None:
            print(self.system.regions.report())
        return t


def _euler_to_quat(euler):
    """Bunge ZXZ Euler angles (radians) -> quaternions."""
    phi1, Phi, phi2 = euler[:, 0], euler[:, 1], euler[:, 2]
    s, c = np.sin(Phi / 2), np.cos(Phi / 2)
    sig, dlt = (phi1 + phi2) / 2, (phi1 - phi2) / 2
    q = np.stack([c * np.cos(sig), s * np.cos(dlt), s * np.sin(dlt),
                  c * np.sin(sig)], axis=1)
    neg = q[:, 0] < 0
    q[neg] *= -1
    return q


def run_simulation(toml_path: str, workdir: str | None = None,
                   verbose: bool = True, device_mesh=None):
    opt = parse_options(toml_path)
    # Solvers.precision = "f32" switches the stack to native f32 for
    # throughput runs (the EXACONSTIT_TPU_PRECISION env var, applied at
    # import, takes priority if set explicitly).
    if "EXACONSTIT_TPU_PRECISION" not in os.environ:
        jax.config.update("jax_enable_x64", opt.precision != "f32")
    # domain decomposition over all visible devices by default (the
    # reference always ParMesh-partitions across ranks)
    if device_mesh is None and opt.parallel_mode != "single" \
            and len(jax.devices()) > 1:
        from .parallel.sharding import make_device_mesh
        device_mesh = make_device_mesh()
        if verbose:
            print(f"domain decomposition over {len(jax.devices())} devices"
                  f" (Solvers.parallel_mode = {opt.parallel_mode})")
    sim = Simulation(opt, workdir=workdir, device_mesh=device_mesh)
    sim.run(verbose=verbose)
    return sim
