"""Ensemble launcher tests (workflows/launcher.py)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAUNCHER = os.path.join(REPO, "workflows", "launcher.py")


def run(args, cwd):
    return subprocess.run([sys.executable, LAUNCHER] + args,
                          cwd=cwd, capture_output=True, text=True)


def test_local_pool_and_resume(tmp_path):
    out = tmp_path / "log"
    r = run(["--shards", "3", "--max-procs", "2", "--logdir", str(out),
             "--", sys.executable, "-c",
             "import sys,os;print('shard', sys.argv[-1]);"
             "sys.exit(0)"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout + r.stderr
    recs = [json.loads(l) for l in
            (out / "manifest.jsonl").read_text().splitlines()]
    assert sorted(rec["task"] for rec in recs) == [0, 1, 2]
    assert all(rec["rc"] == 0 for rec in recs)
    # per-task logs captured the shard argv
    assert "shard 0/3" in (out / "task00000.log").read_text()

    # resume: all complete -> nothing relaunched, still rc 0
    r2 = run(["--shards", "3", "--logdir", str(out),
              "--", sys.executable, "-c", "raise SystemExit(1)"],
             cwd=str(tmp_path))
    assert r2.returncode == 0 and "3 tasks already complete" in r2.stdout


def test_failed_task_reported_and_retried(tmp_path):
    out = tmp_path / "log"
    flag = tmp_path / "fail_once"
    flag.write_text("x")
    prog = ("import os,sys;p=%r;\n"
            "sys.exit(1 if (os.path.exists(p) and "
            "sys.argv[-1].startswith('1/')) else 0)" % str(flag))
    r = run(["--shards", "2", "--logdir", str(out), "--",
             sys.executable, "-c", prog], cwd=str(tmp_path))
    assert r.returncode == 1 and "FAILED tasks: [1]" in r.stdout
    flag.unlink()
    r2 = run(["--shards", "2", "--logdir", str(out), "--",
              sys.executable, "-c", prog], cwd=str(tmp_path))
    assert r2.returncode == 0


def test_slurm_emission(tmp_path):
    out = tmp_path / "log"
    r = run(["--backend", "slurm", "--shards", "4", "--max-procs", "2",
             "--logdir", str(out), "--", "echo", "hi"],
            cwd=str(tmp_path))
    assert r.returncode == 0
    txt = (out / "submit_array.sh").read_text()
    assert "#SBATCH --array=0-3%2" in txt and "--shard 3/4" in txt
