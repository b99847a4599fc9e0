"""Per-stage timing + profiling harness.

The reference's only instrumentation is one steady_clock measurement
around Track() (ref src/pipeline.cpp:144,209-212) shown in the viewer.
Here: a StageTimer that forces device completion per stage (wall-clock
truth under async dispatch) and a jax.profiler hook for real traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax


class StageTimer:
    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        box: List = []
        yield box
        if self.sync and box:
            jax.block_until_ready(box[0])
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def time_stage(self, name: str, fn, *args, **kw):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        if self.sync:
            out = jax.block_until_ready(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def report(self) -> str:
        lines = []
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} {1000*tot/max(n,1):9.2f} ms/call "
                         f"x{n:5d} = {tot:7.2f} s")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace around a block (view with TensorBoard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
