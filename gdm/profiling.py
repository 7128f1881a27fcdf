"""Lightweight tracing/profiling hooks.

The reference logs only CG iteration counts (SURVEY §5); production runs
need per-phase wall-clock and device traces.  `phase_timer` wraps host
phases; `trace` wraps a block in a jax.profiler trace for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_totals = defaultdict(float)
_counts = defaultdict(int)


@contextlib.contextmanager
def phase_timer(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _totals[name] += dt
        _counts[name] += 1


def report() -> dict:
    return {
        k: {"total_s": _totals[k], "count": _counts[k],
            "mean_s": _totals[k] / max(1, _counts[k])}
        for k in sorted(_totals)
    }


def reset():
    _totals.clear()
    _counts.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace via jax.profiler (view in tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
