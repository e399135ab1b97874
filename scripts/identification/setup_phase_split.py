"""Sub-phase attribution of the fused Newton-step operator setup.

Round-4 verdict item 4: ``phase_setup_s`` is ~92% of a production Newton
step at 32^3 and the fused program is a black box.  This times each stage
of the setup pipeline as its OWN jitted program, on the same developed
flow state the bench ramp measures, so the dominant cost is attributed:

  geom      gather_cm + jacobians + adjugate/det + grad_calc (-> L)
  mat       staggered material solve + outputs, NO tangent
  mat+tan   same WITH the consistent tangent  (tangent = mat+tan - mat)
  resid     residual force from stress + scatter-add (f64)
  ea        EA 24x24 block assembly + diagonal + scatter (from c6)
  fused     the production fused setup program (the real thing)

The stage sum exceeds the fused time wherever XLA fusion shares work
(geometry feeds both resid and ea); the point is attribution, not an
identity.  Prints a table and one JSON line for the round record.

Usage: python setup_phase_split.py [nx] [--reps 3] [--dt 0.05]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timed(fn, args, reps):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run_split(ncuts=(32, 32, 32), dt=0.05, reps=3, develop_steps=2):
    from __graft_entry__ import _tiny_problem

    system, v0, x0, state, ess_flat = _tiny_problem(list(ncuts))
    model = system.model
    ev = model.evptn
    from exaconstit_tpu.fem import operators as ops
    from exaconstit_tpu.fem.geometry import (adjugate_3x3_cm, det_3x3_cm,
                                             grad_calc_cm, jacobians_cm)
    from exaconstit_tpu.models import evptn_cm as cm

    # develop plastic flow the same way the bench ramp does
    v, x, st = v0, x0, state
    for d in (0.005, 0.01)[:develop_steps]:
        v, _, st, conv, _, _ = system.newton_solve(v, x, st, d, ess_flat,
                                                   verbose=False)
        x = x + d * v
    jax.block_until_ready(st)

    nsub = system._compute_nsub(v, x, dt)
    nq = system.fes.nqpts
    npts = system.ne_pad * nq

    gather_cm = system._gather_cm
    scatter_cm = system._scatter_add_cm
    dshape, qwts = system.dshape, system.qwts

    def geom(v, x):
        el_x = gather_cm(x + dt * v)
        el_v = gather_cm(v)
        J = jacobians_cm(el_x, dshape)
        adj = adjugate_3x3_cm(J)
        det = det_3x3_cm(J)
        L = grad_calc_cm(el_v, dshape, adj, det)
        return el_x, L

    geom_j = jax.jit(geom)
    el_x, L = geom_j(v, x)
    L_flat = L.reshape(3, 3, npts)

    xw = system._warm_zeros(st.dtype)
    ok = jnp.asarray(False)

    def mat_nt(Lf, st):
        return model.model_setup_cm(dt, Lf, st, compute_tangent=False,
                                    nsub=nsub, x_warm=xw, warm_ok=ok)

    def mat_wt(Lf, st):
        return model.model_setup_cm(dt, Lf, st, compute_tangent=True,
                                    nsub=nsub, x_warm=xw, warm_ok=ok,
                                    with_solution=True)

    mat_nt_j = jax.jit(mat_nt)
    mat_wt_j = jax.jit(mat_wt)
    stress, state_end, c6, x_sol = mat_wt_j(L_flat, st)
    jax.block_until_ready(c6)
    stress_q = stress.reshape(6, nq, -1)
    c6_q = c6.reshape(6, 6, nq, -1)

    def resid(el_x, stress_q):
        f = ops.residual_force_cm(el_x, dshape, qwts, stress_q)
        f = f * system.elem_mask[None, None, :]
        return scatter_cm(f)

    def ea(el_x, c6_q):
        # mirror the production dtype policy (driver._setup_core_cm):
        # f32 block build for mixed-precision kinetics
        if getattr(system, "_ea_asm_f32", False):
            f32 = jnp.float32
            k = ops.assemble_ea_gradient_cm(
                el_x.astype(f32), dshape.astype(f32), qwts.astype(f32),
                c6_q.astype(f32), jnp.asarray(dt, f32))
            k = k * system.elem_mask[None, None, :].astype(f32)
        else:
            k = ops.assemble_ea_gradient_cm(el_x, dshape, qwts, c6_q, dt)
            k = k * system.elem_mask[None, None, :]
        d = ops.ea_diagonal_cm(k, system.fes.ref.nnodes)
        return k, scatter_cm(d)

    results = {}
    results["geom"] = timed(geom_j, (v, x), reps)
    results["mat"] = timed(mat_nt_j, (L_flat, st), reps)
    results["mat+tan"] = timed(mat_wt_j, (L_flat, st), reps)
    results["tangent"] = results["mat+tan"] - results["mat"]
    results["resid"] = timed(jax.jit(resid), (el_x, stress_q), reps)
    results["ea"] = timed(jax.jit(ea), (el_x, c6_q), reps)

    def fused(v, x, st):
        return system._setup(v, x, st, dt, ess_flat, True, nsub, xw, ok)

    results["fused"] = timed(fused, (v, x, st), reps)

    print(f"\nsetup phase split at {tuple(ncuts)} "
          f"({npts} qpts, dt={dt}, backend={jax.default_backend()}):")
    for k in ("geom", "mat", "tangent", "resid", "ea", "fused"):
        frac = results[k] / results["fused"]
        print(f"  {k:8s} {results[k]*1e3:9.1f} ms   {frac*100:5.1f}% "
              f"of fused")
    out = {"metric": "setup_phase_split", "mesh": list(ncuts),
           "qpts": npts, "dt": dt,
           **{f"phase_{k.replace('+', '_')}_s": v
              for k, v in results.items()}}
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("nx", nargs="?", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dt", type=float, default=0.05)
    args = ap.parse_args()
    run_split((args.nx,) * 3, dt=args.dt, reps=args.reps)


if __name__ == "__main__":
    main()
