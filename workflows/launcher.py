#!/usr/bin/env python3
"""Ensemble job launcher for workflow sweeps (Flux/EnTK analog).

The reference drives its GA/UQ ensembles through Flux or EnTK
(workflows/optimization/flux_map.py, workflows/Stage3/.../entk_wf.py).
The TPU-native equivalent here is scheduler-agnostic:

* backend ``local``  — bounded process pool on this host (the common
  case for a TPU VM, where each task pins a different chip via
  ``TPU_VISIBLE_DEVICES``/``JAX_PLATFORMS``);
* backend ``slurm``  — emits a job-array submission script;
* backend ``flux``   — emits a ``flux bulksubmit`` driver script.

Tasks are shard invocations of any workflow CLI that supports
``--shard i/n`` (fit_params.py, loading_sweep.py) or explicit per-task
argument lists from a JSON file.  A JSONL manifest records every task's
status; finished tasks (sentinel present, rc == 0 in the manifest) are
skipped on relaunch, so an interrupted ensemble resumes with
``launcher.py`` re-run — the EnTK-style bookkeeping.

Examples:
  python workflows/launcher.py --shards 8 --max-procs 4 \
      -- python workflows/uq_sweep/loading_sweep.py -opt case.toml \
         --out sweep
  python workflows/launcher.py --backend slurm --shards 64 \
      -- python workflows/optimization/fit_params.py ...
"""

from __future__ import annotations

import argparse
import json
import os
import shlex
import subprocess
import sys
import time


def load_tasks(args):
    """Task list: each is (task_id, argv_suffix, env_extra)."""
    if args.tasks_json:
        with open(args.tasks_json) as f:
            rows = json.load(f)
        return [(i, [str(a) for a in row], {}) for i, row in
                enumerate(rows)]
    return [(i, ["--shard", f"{i}/{args.shards}"], {})
            for i in range(args.shards)]


def manifest_done(path):
    done = set()
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rec.get("rc") == 0:
                    done.add(rec["task"])
    return done


def run_local(cmd, tasks, args):
    done = manifest_done(args.manifest)
    pending = [t for t in tasks if t[0] not in done]
    if done:
        print(f"resume: {len(done)} tasks already complete, "
              f"{len(pending)} to run")
    procs = {}
    with open(args.manifest, "a") as mf:
        while pending or procs:
            while pending and len(procs) < args.max_procs:
                tid, suffix, env_extra = pending.pop(0)
                env = dict(os.environ, **env_extra,
                           EXACONSTIT_TASK_ID=str(tid))
                log = os.path.join(args.logdir, f"task{tid:05d}.log")
                lf = open(log, "w")
                p = subprocess.Popen(cmd + suffix, stdout=lf,
                                     stderr=subprocess.STDOUT, env=env)
                procs[tid] = (p, lf, time.time())
                print(f"launched task {tid} (pid {p.pid})", flush=True)
            for tid in list(procs):
                p, lf, t0 = procs[tid]
                rc = p.poll()
                if rc is None:
                    continue
                lf.close()
                del procs[tid]
                rec = {"task": tid, "rc": rc,
                       "secs": round(time.time() - t0, 1)}
                mf.write(json.dumps(rec) + "\n")
                mf.flush()
                print(f"task {tid} done rc={rc} "
                      f"({rec['secs']}s)", flush=True)
            time.sleep(0.2)
    failed = [t[0] for t in tasks
              if t[0] not in manifest_done(args.manifest)]
    if failed:
        print(f"FAILED tasks: {failed}")
        return 1
    print("all tasks complete")
    return 0


def emit_slurm(cmd, tasks, args):
    path = os.path.join(args.logdir, "submit_array.sh")
    n = len(tasks)
    with open(path, "w") as f:
        f.write("#!/bin/bash\n"
                f"#SBATCH --array=0-{n - 1}%{args.max_procs}\n"
                f"#SBATCH --output={args.logdir}/task%a.log\n\n"
                "case \"$SLURM_ARRAY_TASK_ID\" in\n")
        for tid, suffix, _ in tasks:
            full = " ".join(shlex.quote(c) for c in cmd + suffix)
            f.write(f"  {tid}) {full} ;;\n")
        f.write("esac\n")
    os.chmod(path, 0o755)
    print(f"wrote {path}; submit with: sbatch {path}")
    return 0


def emit_flux(cmd, tasks, args):
    path = os.path.join(args.logdir, "submit_flux.sh")
    with open(path, "w") as f:
        f.write("#!/bin/bash\nset -e\n")
        for tid, suffix, _ in tasks:
            full = " ".join(shlex.quote(c) for c in cmd + suffix)
            f.write(f"flux submit --job-name=task{tid} "
                    f"--output={args.logdir}/task{tid:05d}.log {full}\n")
        f.write("flux queue drain\n")
    os.chmod(path, 0o755)
    print(f"wrote {path}; run under a flux instance")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
        usage="launcher.py [options] -- <command...>")
    ap.add_argument("--backend", choices=["local", "slurm", "flux"],
                    default="local")
    ap.add_argument("--shards", type=int, default=1,
                    help="append '--shard i/n' for i in range(n)")
    ap.add_argument("--tasks-json", default=None,
                    help="JSON list of per-task argv suffixes "
                    "(overrides --shards)")
    ap.add_argument("--max-procs", type=int,
                    default=max(1, (os.cpu_count() or 2) - 1))
    ap.add_argument("--logdir", default="launcher_logs")
    ap.add_argument("--manifest", default=None)
    if argv is None:
        argv = sys.argv[1:]
    if "--" not in argv:
        ap.error("separate the command with '--'")
    split = argv.index("--")
    args = ap.parse_args(argv[:split])
    cmd = argv[split + 1:]
    if not cmd:
        ap.error("empty command")
    os.makedirs(args.logdir, exist_ok=True)
    if args.manifest is None:
        args.manifest = os.path.join(args.logdir, "manifest.jsonl")

    tasks = load_tasks(args)
    if args.backend == "local":
        return run_local(cmd, tasks, args)
    if args.backend == "slurm":
        return emit_slurm(cmd, tasks, args)
    return emit_flux(cmd, tasks, args)


if __name__ == "__main__":
    sys.exit(main())
