"""Element-averaged field post-processing for visualization.

Replicates the reference's Project* pipeline (system_driver.cpp:560-871,
driver registration mechanics_driver.cpp:644-817): all quadrature fields
are volume-averaged per element; ExaCMech state fields are extracted via
the qf_mapping offsets; quaternions are re-normalized; the light_up
extras (element centroid + full elastic strain in the crystal frame) are
produced for lattice-strain ("simulated diffraction") post-processing.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..fem import operators as ops
from ..utils import tensors as tn


def element_average(sim, qf):
    """(ne, nq, k) point-major quadrature field -> (ne_real, k) averages."""
    sysm = sim.system
    ne = sysm.fes.num_elems
    el_x = _el_x_pm(sim)
    qf = jnp.asarray(qf)[:ne]
    wts = ops.quad_point_volumes(el_x, sysm.dshape, sysm.qwts)
    avg = jnp.einsum("eq,eqk->ek", wts, qf) / jnp.sum(wts, axis=1)[:, None]
    return np.asarray(avg)


def _el_x_pm(sim):
    """Gathered element coords (ne_real, nen, 3) in the global element
    order, independent of the system's device layout (vis runs host-side
    once per vis_steps, so a plain numpy gather is fine)."""
    sysm = sim.system
    x = np.asarray(sysm.from_node(sim.x_cur))
    return jnp.asarray(x[np.asarray(sysm.fes.conn)])


def compute_element_fields(sim, light_up=False):
    """All visualization fields as {name: (ne_real, k) array}."""
    sysm = sim.system
    model = sim.model
    ne_real = sysm.fes.num_elems
    fields = {}

    stress = element_average(sim, sysm.from_stress(sim.stress))
    fields["Stress"] = stress
    s = stress
    t1 = s[:, 0] - s[:, 1]
    t2 = s[:, 1] - s[:, 2]
    t3 = s[:, 2] - s[:, 0]
    t4 = s[:, 3] ** 2 + s[:, 4] ** 2 + s[:, 5] ** 2
    fields["VonMisesStress"] = np.sqrt(
        0.5 * (t1 * t1 + t2 * t2 + t3 * t3 + 6.0 * t4))
    fields["HydrostaticStress"] = s[:, :3].mean(axis=1)

    el_x = _el_x_pm(sim)
    vols = np.asarray(ops.element_volumes(el_x, sysm.dshape, sysm.qwts))
    fields["ElementVolume"] = vols[:ne_real]
    fields["GrainId"] = sim.mesh.elem_attr.astype(float)

    state_avg = element_average(sim, sysm.from_state(sim.state))
    qmap = model.qf_mapping
    off, n = qmap["shrateEff"]
    fields["DpEff"] = state_avg[:, off]
    off, n = qmap["shrEff"]
    fields["EffPlasticStrain"] = state_avg[:, off]
    off, n = qmap["hardness"]
    fields["Hardness"] = state_avg[:, off:off + n]
    off, n = qmap["gdot"]
    fields["ShearRate"] = state_avg[:, off:off + n]
    off, n = qmap["quats"]
    q = state_avg[:, off:off + n]
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    fields["LatticeOrientation"] = q

    if light_up:
        # element centroids on the current configuration
        wts = np.asarray(ops.quad_point_volumes(el_x, sysm.dshape,
                                                sysm.qwts))[:ne_real]
        shape = np.asarray(sysm.fes.ref.shape)  # (nq, nen)
        xq = np.einsum("qn,enk->eqk", shape,
                       np.asarray(el_x)[:ne_real])
        fields["ElemCentroid"] = (
            np.einsum("eq,eqk->ek", wts, xq) / wts.sum(axis=1)[:, None])
        # full elastic strain in the crystal frame: dev 5-vec + log(rel vol)
        off, _ = qmap["elas_strain"]
        est = state_avg[:, off:off + 5]
        offv, _ = qmap["rel_vol"]
        vol_strain = np.log(state_avg[:, offv])
        svec = np.array(tn.vecd_to_svec(jnp.asarray(est)))
        svec[:, :3] += vol_strain[:, None]
        fields["XtalElasticStrain"] = svec

    return fields


def write_vis_step(sim, ti, t, entries):
    """Write one visualization dump.

    Backend per requested format (mechanics_driver.cpp:637-817):
    paraview/visit -> VTU + PVD time series; conduit/adios2 -> the binary
    HDF5 data collection (io/hdf5_dc.py).
    """
    import os

    import jax

    base = sim.opt.basename
    fields = compute_element_fields(sim, light_up=sim.opt.light_up)
    # displacement as point data
    x_cur = sim.system.from_node(sim.x_cur)
    disp = x_cur - sim.system.from_node(sim.x_ref)
    vel = sim.system.from_node(sim.v)
    points = {"Displacement": disp, "Velocity": vel}
    # field gathers above are collective; only rank 0 writes files
    # (reference: my_id == 0 gating, system_driver.cpp:461-548)
    if jax.process_index() != 0:
        return

    if sim.opt.paraview or sim.opt.visit:
        from .vtk import write_pvd, write_vtu
        vtu_dir = os.path.join(sim.workdir, base)
        vtu_name = f"step_{ti:06d}.vtu"
        write_vtu(os.path.join(vtu_dir, vtu_name), x_cur,
                  np.asarray(sim.mesh.conn), sim.mesh.order,
                  cell_fields=fields, point_fields=points)
        entries.append((t, os.path.join(base, vtu_name)))
        write_pvd(os.path.join(sim.workdir, base + ".pvd"), entries)
    if sim.opt.conduit or sim.opt.adios2:
        from .hdf5_dc import write_hdf5_step
        write_hdf5_step(os.path.join(sim.workdir, base + ".h5"), ti, t,
                        x_cur, np.asarray(sim.mesh.conn),
                        fields, points)
