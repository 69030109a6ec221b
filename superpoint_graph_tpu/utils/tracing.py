"""Structured timing + device profiling.

The reference's observability is ad-hoc wall-clock buckets and logging.debug
millisecond prints (SURVEY.md §5.1). Here: a nestable StageTimer whose report
feeds trainlog/bench output, and a `trace` context that captures a
`jax.profiler` trace when SPGT_TRACE_DIR is set — one switch to get full XLA
timelines on TPU.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict


class StageTimer:
    """Accumulating wall-clock buckets (the partition CLI's 3-bucket timing,
    reference partition.py:48,189, generalized)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict:
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k],
                "mean_s": round(v / max(self.counts[k], 1), 4)}
            for k, v in sorted(self.totals.items())
        }

    def __str__(self):
        return json.dumps(self.report())


@contextlib.contextmanager
def trace(name: str = "spgt"):
    """Capture a jax.profiler trace into $SPGT_TRACE_DIR/<name> when set;
    no-op otherwise (keeps production paths clean)."""
    trace_dir = os.environ.get("SPGT_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    path = os.path.join(trace_dir, name)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield


def annotate(name: str):
    """Named region visible in profiler timelines (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
