"""Tracing / profiling helpers.

The reference's only instrumentation is cumulative wall-clock fps prints
between phases (test_online_ssd.py:302-303,395-396,402-403,418-419). Here:
- :class:`PhaseTimer` keeps that per-phase fps report (the pipeline fills a
  dict with the same phase names), and
- :func:`trace` wraps ``jax.profiler`` so any section can be captured as a
  TensorBoard-viewable device trace (`trace_dir` -> perfetto/TB).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Cumulative per-phase fps, reference-style."""

    def __init__(self, num_frames: int):
        self.num_frames = num_frames
        self.t0 = time.time()
        self.fps: Dict[str, float] = {}
        self.ms: Dict[str, float] = {}
        self._last = self.t0

    def mark(self, phase: str, sync=None) -> None:
        if sync is not None:
            jax.block_until_ready(sync)
        now = time.time()
        self.fps[phase] = self.num_frames / (now - self.t0)
        self.ms[phase] = (now - self._last) * 1000.0
        self._last = now

    def report(self) -> str:
        parts = [f"{k}: {self.fps[k]:.1f} fps (+{self.ms[k]:.0f} ms)"
                 for k in self.fps]
        return " | ".join(parts)


@contextlib.contextmanager
def trace(trace_dir: Optional[str]):
    """Capture a jax.profiler device trace for the enclosed section.

    No-op when trace_dir is None, so call sites can take a flag directly.
    """
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-span inside a trace (shows up in the TB timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield
