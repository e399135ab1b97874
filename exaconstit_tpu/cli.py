"""Command-line entry point: ``python -m exaconstit_tpu.cli -opt file.toml``.

Mirrors the reference binary's interface (``mechanics -opt options.toml``,
src/mechanics_driver.cpp:139-152).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="mechanics",
        description="ExaConstit-TPU: crystal-plasticity FEM on TPU")
    parser.add_argument("-opt", "--options", dest="opt", required=True,
                        help="TOML options file to use")
    parser.add_argument("-q", "--quiet", action="store_true")
    args = parser.parse_args(argv)

    # Multi-host SPMD: the reference is an MPI code (MPI_Init,
    # mechanics_driver.cpp:119); the TPU-native equivalent is
    # jax.distributed over ICI/DCN.  Initialize whenever a multi-process
    # launcher provided coordination env (jax's own JAX_COORDINATOR_*, or
    # explicit EXACONSTIT_TPU_DIST=1 with standard cluster envs) so every
    # jitted collective below spans all processes' devices.
    import os as _os
    if (_os.environ.get("EXACONSTIT_TPU_DIST") == "1"
            or _os.environ.get("JAX_COORDINATOR_ADDRESS")):
        import jax

        # jax's cluster auto-detection covers SLURM/OpenMPI/TPU pods;
        # for plain multi-process launches (the mpirun -np N analog,
        # tests/test_distributed.py) pass the generic env triplet
        # explicitly.
        def _ienv(name):
            v = _os.environ.get(name)
            return int(v) if v is not None else None

        jax.distributed.initialize(
            coordinator_address=_os.environ.get("JAX_COORDINATOR_ADDRESS"),
            num_processes=_ienv("JAX_NUM_PROCESSES"),
            process_id=_ienv("JAX_PROCESS_ID"))

    from .driver import run_simulation
    from .utils.profiling import maybe_profile

    start = time.time()
    with maybe_profile():  # Perfetto trace via EXACONSTIT_TPU_PROFILE_DIR
        sim = run_simulation(args.opt, verbose=not args.quiet)
    elapsed = time.time() - start
    print(f"The process took {elapsed:f} seconds to run")
    # per-step solve timing log (mechanics_driver.cpp:982-998).
    # NOTE: written under timing/ (not the reference's time/) because a
    # time/ directory on sys.path would shadow the stdlib time module.
    import os
    os.makedirs("timing", exist_ok=True)
    with open("timing/time_solve.0.txt", "a") as f:
        for dt in sim.step_times:
            f.write(f"{dt:.8g}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
