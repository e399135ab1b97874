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
