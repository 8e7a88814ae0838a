"""Tracing / profiling.

The reference's only instrumentation is wall-clock deltas
(``kitti/train_classifier.py:62,72,131``).  Here: a step timer with jitted-
aware synchronisation plus ``jax.profiler`` trace capture for perfetto/
tensorboard analysis (SURVEY.md §5 'Tracing / profiling').
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


class StepTimer:
    """Wall-clock timer that blocks on device results before stamping."""

    def __init__(self):
        self.history: Dict[str, list] = {}

    @contextlib.contextmanager
    def time(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.history.setdefault(name, []).append(time.perf_counter() - t0)

    def mean(self, name: str, skip_first: int = 1) -> float:
        h = self.history.get(name, [])
        h = h[skip_first:] if len(h) > skip_first else h
        return sum(h) / max(len(h), 1)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in tensorboard/perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield
