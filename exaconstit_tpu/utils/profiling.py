"""Region timing + profiling hooks (Caliper equivalent).

The reference annotates every layer with Caliper macros
(src/mechanics_log.hpp, marks listed in SURVEY.md section 5).  Here:

* ``Regions`` accumulates host-side wall time per named region (the
  analog of the CALI_MARK_BEGIN/END pairs around NR/Krylov/material
  phases), dumped as a table at the end of a run;
* device-side tracing uses ``jax.named_scope`` inside the jitted
  functions plus ``jax.profiler`` (Perfetto) via
  EXACONSTIT_TPU_PROFILE_DIR for kernel-level timelines.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

import jax


class Regions:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def region(self, name, block_on=None):
        t0 = time.perf_counter()
        with jax.named_scope(name):
            yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def mark(self, name, seconds):
        self.totals[name] += seconds
        self.counts[name] += 1

    def report(self):
        lines = ["region timings:"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"  {name:28s} {self.totals[name]:10.3f}s "
                         f"x{self.counts[name]}")
        return "\n".join(lines)


@contextlib.contextmanager
def maybe_profile():
    """Perfetto trace when EXACONSTIT_TPU_PROFILE_DIR is set."""
    d = os.environ.get("EXACONSTIT_TPU_PROFILE_DIR")
    if not d:
        yield
        return
    jax.profiler.start_trace(d)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
