"""Tracing / profiling / failure-detection utilities.

The reference has none of these (SURVEY section 5: wall-clock prints only,
NaN -> ipdb.set_trace, train.py:319-321). Here:

* `trace(logdir)`          — context manager around jax.profiler traces
                             (view in TensorBoard / xprof)
* `StepTimer`              — rolling per-step wall/device timing
* `check_finite(metrics)`  — NaN/Inf detection with a structured report
                             (replaces the reference's debugger hook with
                             something usable in unattended runs)
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Dict, Iterable, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Capture a jax.profiler trace for the enclosed block when logdir is
    set; no-op otherwise."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window: int = 50):
        self._times = deque(maxlen=window)
        self._last = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self._times)) if self._times else 0.0

    @property
    def p50(self) -> float:
        return float(np.median(self._times)) if self._times else 0.0


class NonFiniteLossError(RuntimeError):
    pass


def check_finite(metrics: Dict[str, float], step: int,
                 action: str = "raise") -> bool:
    """Detect non-finite losses. action: 'raise' | 'skip' (return False) |
    'ignore'. (The reference drops into ipdb, train.py:319-321 — useless in
    unattended TPU jobs.)"""
    bad = {k: v for k, v in metrics.items()
           if not np.isfinite(float(v))}
    if not bad:
        return True
    msg = f"non-finite losses at step {step}: {sorted(bad)}"
    if action == "raise":
        raise NonFiniteLossError(msg)
    if action == "skip":
        print("WARNING:", msg, "- skipping update")
        return False
    return True
