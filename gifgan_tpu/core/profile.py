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
import os
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


def summarize_trace(log_dir: str, top: int = 25) -> Dict:
    """Aggregate device-op wall time from the newest jax.profiler capture
    under `log_dir` (the chrome-trace .trace.json.gz every capture writes).

    Returns {"total_us", "ops": [(name, us, pct), ...], "by_category":
    {category: us}} where categories bucket HLO names (fusion/conv/copy/
    all-reduce/...). Python-frame events ("$file.py ..." names) and
    runtime-internal rows are excluded — only compiled-program ops count,
    so `total_us` is device-execution time, comparable across backends."""
    import glob
    import gzip
    import json as _json

    paths = sorted(glob.glob(os.path.join(
        log_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {log_dir}")
    with gzip.open(paths[-1]) as f:
        events = _json.load(f)["traceEvents"]

    durs: Dict[str, float] = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        # keep only HLO-op rows: python frames start with "$", dispatch
        # wrappers with "PjitFunction(", and every runtime-internal row
        # ("Handle inputs", "end: ...", "Foo::Bar") contains a space or colon
        # — HLO op names never do
        if (not name or name.startswith("$") or " " in name or ":" in name
                or name.startswith("PjitFunction")
                or name in ("ParseArguments", "CollectGarbage")):
            continue
        durs[name] = durs.get(name, 0.0) + float(e["dur"])

    def category(name: str) -> str:
        base = name.split(".")[0].split("(")[0]
        for key in ("fusion", "convolution", "conv", "dot", "copy",
                    "all-reduce", "all-gather", "reduce-scatter", "scatter",
                    "gather", "transpose", "reshape", "rng", "while",
                    "dynamic-update-slice", "dynamic-slice"):
            if key in base:
                return key
        return base or "other"

    total = sum(durs.values())
    by_cat: Dict[str, float] = {}
    for n, d in durs.items():
        c = category(n)
        by_cat[c] = by_cat.get(c, 0.0) + d
    ops = sorted(durs.items(), key=lambda kv: -kv[1])[:top]
    return {"total_us": total,
            "ops": [(n, d, 100.0 * d / total if total else 0.0)
                    for n, d in ops],
            "by_category": dict(sorted(by_cat.items(),
                                       key=lambda kv: -kv[1]))}
