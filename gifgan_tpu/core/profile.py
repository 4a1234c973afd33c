"""Profiling / tracing.

The reference's only timing is a per-batch wall-clock print scraped post-hoc
(model.py:246-248 + time_script.py:6-18). Here:
  - `trace(...)`: a context manager around jax.profiler — writes a
    TensorBoard-loadable trace of device execution,
  - `step_timer(...)`: per-step wall timing with device sync (the axon relay
    under-reports with block_until_ready alone — sync by fetching a scalar),
  - `estimate_epoch_hours`: the time_script.py extrapolation as a function.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterable, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with profile.trace("runs/x/trace"): step(...)`.
    View with TensorBoard or xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force device completion in a relay-safe way (fetch one scalar)."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(jax.device_get(leaves[0])).ravel()[:1]


class StepTimes:
    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, result_getter=None):
        t0 = time.perf_counter()
        out = {}
        yield out
        if "result" in out:
            sync(out["result"])
        self.times.append(time.perf_counter() - t0)

    def summary(self, skip: int = 1) -> Dict[str, float]:
        ts = np.asarray(self.times[skip:] or self.times)
        return {"mean_s": float(ts.mean()),
                "p50_s": float(np.percentile(ts, 50)),
                "steps_per_sec": float(1.0 / ts.mean()),
                "n": int(len(ts))}


def estimate_epoch_hours(step_seconds: Iterable[float],
                         batches_per_epoch: int) -> float:
    """Average step time -> epoch hours (reference time_script.py:14-18,
    which assumed 3165 batches/epoch)."""
    ts = np.asarray(list(step_seconds), np.float64)
    return float(ts.mean() * batches_per_epoch / 3600.0)
