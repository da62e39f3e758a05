"""Tracing / profiling utilities.

The reference's only performance instrumentation is a manual wall-clock
timer over single-image forwards (reference ``src/predict.py:425-448``).
Here profiling is first-class:

* :func:`trace` — a ``jax.profiler`` trace context writing TensorBoard-viewable
  traces (XLA op timelines) to ``results/logs/profiles``.
* :class:`StepTimer` — cheap per-step wall timing with warmup discard and
  percentile summaries, used by benchmarks and available to the train loop.
* :func:`annotate` — ``jax.profiler.TraceAnnotation`` for named regions.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "results/logs/profiles",
          create_perfetto_link: bool = False):
    """Capture a device trace around a code region."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def run_maybe_traced(run, profile: bool, cfg) -> None:
    """Shared ``--profile`` wrapper for the CLI entry points: when enabled,
    capture a device trace of ``run()`` under ``<PATHS.LOGS>/profiles`` and
    print where it landed; otherwise just run. One implementation so the
    train/predict/explain CLIs cannot drift."""
    if not profile:
        run()
        return
    log_dir = os.path.join(cfg["PATHS"]["LOGS"], "profiles")
    with trace(log_dir):
        run()
    print(f"profiler trace written to {log_dir}")


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with warmup discard."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._times.append(time.perf_counter() - self._t0)

    @property
    def times(self) -> np.ndarray:
        # Warmup samples are ALWAYS discarded — returning them when the run
        # is short would report compile latency as steady-state step time.
        return np.asarray(self._times[self.warmup:])

    def summary(self) -> Dict[str, float]:
        t = self.times
        if not len(t):
            return {}
        return {
            "mean_ms": float(t.mean() * 1000),
            "std_ms": float(t.std() * 1000),
            "p50_ms": float(np.percentile(t, 50) * 1000),
            "p95_ms": float(np.percentile(t, 95) * 1000),
            "steps": int(len(t)),
        }
