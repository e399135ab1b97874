"""Benchmark: the two north-star metrics (BASELINE.md) on one chip.

Legs ordered by information value (round-4 verdict item 1) so the
driver-captured record carries the headline numbers even when its budget
cuts the tail:

  1. 32^3 Newton-Krylov dt-ramp (production per-step wall time, phase
     split, Krylov convergence honesty) — the north-star metric.
  2. Isolated f32-dogleg-stage A/B at the 884,736-point production batch
     (``pallas_speedup``).
  3. 48^3 ramp, then GMG-vs-Jacobi on the SAME system (the
     preconditioner swap reuses the compiled setup program).
  4. 64^3 ramp (2.1M qpts on the single chip).
  5. 16^3 proxy legs LAST: the round-1 ``qpt_material_evals_per_sec``
     protocol that anchors ``vs_baseline`` continuity.

Every leg _emit()s immediately, so a mid-leg kill preserves all prior
legs.  Until leg 5 runs, the primary metric line is the 32^3 step time
(vs_baseline against the round-4 record for the same mesh/protocol).

Prints ONE JSON line per upgrade; the last line carries every key.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# The axon TPU tunnel is single-client and sometimes down for hours; a
# dead tunnel makes the first backend touch hang indefinitely, which
# would leave the unattended round-end bench with NO output line at
# all.  Probe the ambient backend in a hard-timeout subprocess first
# and re-exec on CPU if it does not come up.
if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("EXACONSTIT_BENCH_PROBED") != "1"):
    os.environ["EXACONSTIT_BENCH_PROBED"] = "1"
    try:
        ok = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            env=dict(os.environ), timeout=240,
            capture_output=True).returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        print("# TPU tunnel probe failed; re-exec on CPU", flush=True)
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        os.execvpe(sys.executable, [sys.executable] + sys.argv, env)

import jax

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
PEAK_BF16 = 197e12  # TPU v5e chip peak (bf16 FLOP/s)
PEAK_HBM_BW = 819e9  # TPU v5e HBM bandwidth (bytes/s)
# Round-4 32^3 steady-state step (BENCH_r04 newton_ramp_steps dt=0.01:
# 2.977 s) — the vs_baseline anchor for the provisional step-time metric
# used until the 16^3 evals/s leg restores the round-1 protocol.
R4_STEP32_S = 2.977


def material_throughput(system, v0, x0, state, ess_flat):
    """Round-1 protocol: fused jit step at [16,16,16], 3 setups/step."""
    nqpts_total = system.ne_pad * system.fes.nqpts
    step = system.make_jit_step(newton_iters=2)
    evals_per_step = 3 * nqpts_total

    # develop plastic flow; dt ramps keep each device execution under the
    # ~60s axon watchdog
    v, x, st = v0, x0, state
    for dt in (0.005, 0.01, 0.02, 0.05):
        v, x, _, st, _ = step(v, x, st, dt, ess_flat)
        jax.block_until_ready(st)
    dt = 0.05
    out = step(v, x, st, dt, ess_flat)
    jax.block_until_ready(out)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(v, x, st, dt, ess_flat)
        jax.block_until_ready(out)
    secs = (time.perf_counter() - t0) / reps

    # archive a kernel-level profiler trace of one steady-state step
    # (EXACONSTIT_BENCH_TRACE=0 disables; view with tensorboard/xprof or
    # perfetto on the .trace.json.gz inside)
    tdir = os.environ.get("EXACONSTIT_BENCH_TRACE", "bench_trace")
    if tdir not in ("", "0"):
        try:
            with jax.profiler.trace(tdir):
                jax.block_until_ready(step(v, x, st, dt, ess_flat))
        except Exception as e:  # profiling must never fail the bench
            print(f"# trace skipped: {e}", flush=True)

    # XLA cost-model FLOPs + HBM traffic of the compiled fused step
    # (roofline: this workload is a deep f64/f32 implicit point solve --
    # VPU/transcendental-bound, not MXU matmul-bound -- so bf16-peak MFU
    # is reported only as the conventional lower bound, alongside the
    # HBM-bandwidth utilization that actually binds elementwise phases)
    flops, hbm_bytes = None, None
    try:
        comp = step.lower(v, x, st, dt, ess_flat).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca.get("flops", 0.0)) or None
        hbm_bytes = float(ca.get("bytes accessed", 0.0)) or None
    except Exception:
        pass
    return evals_per_step / secs, secs, flops, hbm_bytes


NK_RAMP = (0.005, 0.01, 0.02)  # fresh dt increments, developing flow


def _build_problem(ncuts):
    from __graft_entry__ import _tiny_problem

    # phase accounting on for this system (block_until_ready at phase
    # boundaries; the per-step totals are what the reference's Caliper
    # marks measure, so the sync overhead is part of the protocol)
    os.environ["EXACONSTIT_TPU_REGIONS"] = "1"
    try:
        return _tiny_problem(list(ncuts))
    finally:
        os.environ.pop("EXACONSTIT_TPU_REGIONS", None)


def newton_ramp(bundle):
    """Production Newton-Krylov timestep cost in DEVELOPING plastic flow.

    Honest protocol (round-3 verdict item 3): a fresh 3-step dt ramp
    from the virgin state, timed per step; compilation is paid by a
    separate warm pass (one full solve at the first ramp dt + one
    residual-only call covers every program the timed ramp executes).
    Each timed step is a genuine dt increment from a cold Newton start
    (reference-like multi-iteration steps, mechanics_driver.cpp:837-968),
    not a re-solve of an already-converged state.  Records per step:
    wall seconds, NR iterations, Krylov iterations per NR iteration,
    per-solve Krylov ``converged`` flags + achieved residual reduction
    (round-4 verdict item 5 — a capped solve no longer masquerades as a
    convergence count), and the host-region phase split.
    """
    system, v0, x0, state, ess_flat = bundle

    # warm/compile pass: one full solve + the line-search residual
    # program (same shapes/signatures as every timed step)
    v, _, st2, _, _, _ = system.newton_solve(v0, x0, state, NK_RAMP[0],
                                             ess_flat, verbose=False)
    nsub = system._compute_nsub(v0, x0, NK_RAMP[0])
    warm = getattr(system, "_warm_arity", False)
    if warm:
        jax.block_until_ready(system._residual_only(
            v, x0, state, NK_RAMP[0], ess_flat, nsub,
            system._warm_zeros(state.dtype), jax.numpy.asarray(False)))
    else:
        jax.block_until_ready(system._residual_only(
            v, x0, state, NK_RAMP[0], ess_flat, nsub))

    v, x, st = v0, x0, state
    steps = []
    for dt in NK_RAMP:
        system.regions.totals.clear()
        system.regions.counts.clear()
        t0 = time.perf_counter()
        v, stress, st2, conv, nit, _ = system.newton_solve(
            v, x, st, dt, ess_flat, verbose=False)
        jax.block_until_ready(stress)
        secs = time.perf_counter() - t0
        stats = dict(system.last_newton_stats)
        steps.append({
            "dt": dt, "secs": secs, "nr_iters": stats["nr_iters"],
            "krylov_iters": stats["krylov_iters"],
            "krylov_converged": stats.get("krylov_converged", []),
            "krylov_relres": [float(f"{r:.3e}") for r in
                              stats.get("krylov_relres", [])],
            "phase_setup_s": system.regions.totals.get(
                "operator_setup", 0.0),
            "phase_krylov_s": system.regions.totals.get(
                "krylov_solve", 0.0),
            "phase_linesearch_s": system.regions.totals.get(
                "line_search", 0.0),
            "converged": bool(conv),
        })
        x = x + dt * v
        st = st2
    npts = system.ne_pad * system.fes.nqpts
    return steps, npts


def _emit(out):
    """Print + fsync the metric JSON line and mirror it to disk.

    Called after EVERY measurement upgrade, so even if the driver's hard
    timeout kills the process mid-bench the record holds the best line
    so far (round-2 failure mode: a 64^3 OOM/compile starved the whole
    record — BENCH_r02.json rc=124, parsed=null)."""
    line = json.dumps(out)
    print(line, flush=True)
    try:
        os.fsync(sys.stdout.fileno())
    except OSError:
        pass
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_latest.json"), "w") as f:
            f.write(line + "\n")
    except OSError:
        pass


def main():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _tiny_problem

    budget_s = float(os.environ.get("EXACONSTIT_BENCH_BUDGET_S", "2400"))
    t_start = time.perf_counter()
    on_tpu = jax.default_backend() == "tpu"

    def elapsed():
        return time.perf_counter() - t_start

    def leg_fits(name, est_cost_s):
        if elapsed() + est_cost_s <= budget_s:
            return True
        print(f"# skipping leg {name} (elapsed {elapsed():.0f}s + "
              f"est {est_cost_s:.0f}s > budget {budget_s:.0f}s)",
              flush=True)
        return False

    out = {
        "metric": "newton_krylov_step_seconds",
        "value": None, "unit": "s", "vs_baseline": None,
        "backend": jax.default_backend(),
    }

    # ---- leg 1+: production Newton-Krylov ramps (ascending sizes) -------
    def do_size(ncuts, tag=""):
        t_leg = time.perf_counter()
        try:
            bundle = _build_problem(ncuts)
            nk_steps, nk_npts = newton_ramp(bundle)
        except Exception as e:
            print(f"# newton-step bench at {ncuts} failed: "
                  f"{str(e)[:500]}", flush=True)
            return None
        # headline = the most expensive (multi-NR-iteration) step of the
        # fresh developing-flow ramp; per-step details ride alongside.
        worst = max(nk_steps, key=lambda s: s["secs"])
        tot_nr = sum(s["nr_iters"] for s in nk_steps)
        p = f"newton{tag}_{ncuts[0]}" if tag or ncuts[0] != 32 \
            else "newton_32"
        out[f"{p}_step_seconds"] = worst["secs"]
        out[f"{p}_ramp_steps"] = nk_steps
        out[f"{p}_secs_per_nr_iter"] = (
            sum(s["secs"] for s in nk_steps) / max(tot_nr, 1))
        out[f"{p}_qpts"] = nk_npts
        out[f"{p}_precond"] = getattr(bundle[0], "precond_kind", "jacobi")
        if not tag and ncuts == primary_mesh:
            # provisional primary metric: the steady-state (dt=0.01)
            # 32^3 step — directly comparable to BENCH_r04
            steady = nk_steps[1] if len(nk_steps) > 1 else worst
            out["newton_krylov_step_seconds"] = worst["secs"]
            out["newton_step_nr_iters"] = worst["nr_iters"]
            out["newton_step_krylov_iters"] = worst["krylov_iters"]
            out["newton_ramp_steps"] = nk_steps
            out["newton_step_qpts"] = nk_npts
            out["newton_step_mesh"] = list(ncuts)
            if out["value"] is None:
                out["value"] = steady["secs"]
                out["vs_baseline"] = R4_STEP32_S / steady["secs"]
        print(f"# leg newton{tag} {ncuts} done in "
              f"{time.perf_counter()-t_leg:.0f}s", flush=True)
        _emit(out)
        return bundle

    primary_mesh = (32, 32, 32) if on_tpu else (8, 8, 8)
    do_size(primary_mesh)

    # ---- leg 2: isolated f32-dogleg-stage A/B at the production batch --
    # (round-3 verdict item 4 / round-4 item 1): the decisive
    # production-batch comparison for the Pallas kernel.
    if on_tpu and os.environ.get("EXACONSTIT_BENCH_PALLAS", "1") != "0" \
            and leg_fits("pallas_stage_ab", 300):
        t_leg = time.perf_counter()
        try:
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "scripts", "identification"))
            from pallas_stage_bench import run_ab
            ab = run_ab(N=884736, dt=0.05, reps=3)
            out["pallas_speedup"] = ab["speedup"]
            out["pallas_stage_ms"] = ab["t_pallas"] * 1e3
            out["xla_stage_ms"] = ab["t_xla"] * 1e3
            out["pallas_stage_batch"] = ab["n"]
            out["pallas_stage_iters_mean"] = ab["iters_mean"]
            out["pallas_stage_max_abs_diff"] = ab["max_abs_diff"]
            if "xla_bytes_per_pt" in ab:
                out["stage_xla_flops_per_pt"] = ab["xla_flops_per_pt"]
                out["stage_xla_bytes_per_pt"] = ab["xla_bytes_per_pt"]
            # the dispatch policy the production path applies (models/
            # ecmech.py): XLA below the measured crossover, Pallas above
            from exaconstit_tpu.models.ecmech import PALLAS_MIN_BATCH
            out["pallas_min_batch"] = PALLAS_MIN_BATCH
            print(f"# leg pallas_stage_ab done in "
                  f"{time.perf_counter()-t_leg:.0f}s", flush=True)
            _emit(out)
        except Exception as e:
            print(f"# pallas stage A/B failed: {str(e)[:400]}",
                  flush=True)

    # ---- leg 3: 48^3 ramp + GMG-vs-Jacobi on the same system -----------
    # The production default preconditioner is "auto" (GMG on structured
    # single-device meshes, the decision BENCH_r05 recorded), so the
    # primary 48^3 ramp above already ran GMG; the A/B re-ramps the SAME
    # compiled system with the other preconditioner (only the Krylov
    # program recompiles — MechSystem.rebuild_krylov).
    if on_tpu and leg_fits("newton_48", 500):
        bundle48 = do_size((48, 48, 48))
        if (bundle48 is not None
                and os.environ.get("EXACONSTIT_BENCH_GMG", "1") != "0"
                and leg_fits("gmg_48", 220)):
            t_leg = time.perf_counter()
            primary_steps = out.get("newton_48_ramp_steps")
            system48 = bundle48[0]
            primary_kind = system48.precond_kind
            other = "jacobi" if primary_kind == "gmg" else "gmg"
            try:
                system48.rebuild_krylov(other)
                if system48.precond_kind == primary_kind:
                    raise RuntimeError(f"{other} preconditioner "
                                       "unavailable")
                other_steps, _ = newton_ramp(bundle48)
            except Exception as e:
                print(f"# precond A/B failed: {str(e)[:400]}", flush=True)
                other_steps = None
            finally:
                system48.rebuild_krylov("auto")
            if other_steps:
                gmg_steps = (other_steps if other == "gmg"
                             else primary_steps)
                jac_steps = (other_steps if other == "jacobi"
                             else primary_steps)
                worst = max(gmg_steps, key=lambda s: s["secs"])
                out["gmg_step_seconds"] = worst["secs"]
                out["gmg_step_krylov_iters"] = worst["krylov_iters"]
                out["gmg_ramp_steps"] = gmg_steps
                out["jacobi_ramp_steps"] = jac_steps
                jtot = sum(s["secs"] for s in jac_steps)
                gtot = sum(s["secs"] for s in gmg_steps)
                out["gmg_ramp_speedup"] = jtot / gtot
                print(f"# leg precond A/B (primary={primary_kind}) done "
                      f"in {time.perf_counter()-t_leg:.0f}s", flush=True)
                _emit(out)

    # ---- leg 4: 64^3 (2.1M qpts, single-chip capacity headline) --------
    if on_tpu and leg_fits("newton_64", 700):
        do_size((64, 64, 64))

    # ---- leg 5 (LAST): 16^3 proxy legs — round-1 protocol continuity --
    if leg_fits("evals16", 280):
        t_leg = time.perf_counter()
        # primary-metric leg pinned to the XLA point solve (the round-1
        # baseline protocol was XLA; the production Pallas auto-switch is
        # off at this batch size anyway — see pallas_min_batch)
        os.environ["EXACONSTIT_PALLAS"] = "0"
        try:
            system, v0, x0, state, ess_flat = _tiny_problem([16, 16, 16])
            evals_s, step_secs, flops, hbm_bytes = material_throughput(
                system, v0, x0, state, ess_flat)
        except Exception as e:
            print(f"# evals16 leg failed: {str(e)[:400]}", flush=True)
            evals_s = None
        finally:
            os.environ.pop("EXACONSTIT_PALLAS", None)

        if evals_s:
            baseline = None
            if os.path.exists(BASELINE_FILE):
                with open(BASELINE_FILE) as f:
                    baseline = json.load(f).get("value")
            if baseline is None:
                baseline = evals_s
                with open(BASELINE_FILE, "w") as f:
                    json.dump({"value": evals_s,
                               "metric":
                               "qpt_material_evals_per_sec_per_chip"}, f)
            out["metric"] = "qpt_material_evals_per_sec_per_chip"
            out["value"] = evals_s
            out["unit"] = "evals/s"
            out["vs_baseline"] = evals_s / baseline
            if flops:
                out["fused_step_gflops"] = flops / 1e9
                out["fused_step_gflops_per_s"] = flops / step_secs / 1e9
                out["mfu_bf16"] = flops / step_secs / PEAK_BF16
            if hbm_bytes:
                out["fused_step_hbm_gb"] = hbm_bytes / 1e9
                out["hbm_gbytes_per_s"] = hbm_bytes / step_secs / 1e9
                out["hbm_bw_utilization"] = (hbm_bytes / step_secs
                                             / PEAK_HBM_BW)
            print(f"# leg evals16 done in "
                  f"{time.perf_counter()-t_leg:.0f}s", flush=True)
            _emit(out)

    if out["value"] is None:
        # nothing measured (all legs failed) — still print a parseable
        # line so the round record shows the failure mode, not silence
        out["value"] = 0.0
        out["vs_baseline"] = 0.0
        _emit(out)


if __name__ == "__main__":
    main()
