"""
Tracing / profiling hooks (SURVEY.md section 5.1: the reference has none;
detex_tpu provides per-stage wall-clock timers and optional XLA profiler
traces).

Usage:
    with detex_tpu.profiling.stage("detect.scan"):
        ...
    detex_tpu.profiling.report()        # DataFrame of stage timings

    with detex_tpu.profiling.xla_trace("/tmp/trace"):
        ...                              # view in TensorBoard/Perfetto
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import pandas as pd

_STATS = defaultdict(lambda: [0, 0.0])  # name -> [count, total_seconds]
enabled = True


@contextlib.contextmanager
def stage(name):
    """Accumulate wall-clock time for a named pipeline stage."""
    if not enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _STATS[name][0] += 1
        _STATS[name][1] += dt


def report(reset=False):
    """Stage timing summary as a DataFrame (calls, total_s, mean_ms)."""
    rows = [dict(stage=k, calls=v[0], total_s=round(v[1], 4),
                 mean_ms=round(1e3 * v[1] / max(v[0], 1), 3))
            for k, v in sorted(_STATS.items())]
    if reset:
        _STATS.clear()
    return pd.DataFrame(rows)


def reset():
    _STATS.clear()


@contextlib.contextmanager
def xla_trace(logdir):
    """Capture an XLA profiler trace (jax.profiler) around a block."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
