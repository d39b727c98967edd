"""Profiling / step-timing hooks (SURVEY.md §5.1).

The reference's only instrumentation is wall-clock training time
(reference: src/training/train.py:432,448,552-557).  Here: a step timer that
aggregates per-phase statistics, and a thin wrapper over ``jax.profiler`` to
capture device traces viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List


class StepTimer:
    """Collects wall-clock durations per named phase."""

    def __init__(self):
        self.durations: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.durations[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ds in self.durations.items():
            n = len(ds)
            total = sum(ds)
            out[name] = {"count": n, "total_s": total, "mean_s": total / n,
                         "min_s": min(ds), "max_s": max(ds)}
        return out

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items()):
            lines.append(f"{name:24s} n={s['count']:5d} total={s['total_s']:8.2f}s "
                         f"mean={1e3 * s['mean_s']:8.2f}ms")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``log_dir``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
