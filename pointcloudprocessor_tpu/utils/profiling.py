"""Tracing, stage timing, and structured metrics.

The reference's only observability is wall-clock prints around MLS
(`cloudSmooth.cpp:101,165-177`) and Ceres' per-iteration stdout
(`visual_camera_calibration.cpp:209,245-249`). Here observability is a
subsystem:

- :class:`StageTimer` — named stage timings with optional device sync, the
  structured version of the reference's scattered `std::chrono` prints;
- :func:`trace` — JAX profiler capture (XLA-level, viewable in
  TensorBoard/Perfetto) around any block;
- :class:`MetricsLogger` — append-only JSONL metrics stream (one object per
  event) for machine consumption.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


class StageTimer:
    """Collects named stage durations; drop-in for the pipeline's timings
    dict. ``sync`` waits for device completion so a stage's time is real
    execution, not async dispatch."""

    def __init__(self, sync: bool = False):
        self.timings: dict[str, float] = {}
        self._sync = sync

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self._sync and sync_value is not None:
                import jax

                jax.block_until_ready(sync_value)
            self.timings[name] = self.timings.get(name, 0.0) + time.perf_counter() - t0


@contextlib.contextmanager
def trace(log_dir: str):
    """JAX/XLA profiler capture around a block (open the trace with
    TensorBoard's profile plugin or Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a profiler capture (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class MetricsLogger:
    """Append-only JSONL metrics: one `{"ts": ..., "event": ..., **fields}`
    object per line. Pass ``path=None`` to disable (no-op)."""

    def __init__(self, path: Optional[str]):
        self._path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, event: str, **fields) -> None:
        if not self._path:
            return
        rec = {"ts": time.time(), "event": event}
        rec.update(fields)
        with open(self._path, "a") as f:
            f.write(json.dumps(rec) + "\n")
