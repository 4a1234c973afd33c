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

    # device (TPU/xprof) traces nest ops under module/step container rows
    # on sibling threads — keep ONLY the "XLA Ops" threads when present;
    # CPU traces have no such thread and fall back to name filtering.
    op_threads = {(e.get("pid"), e.get("tid"))
                  for e in events
                  if e.get("ph") == "M" and e.get("name") == "thread_name"
                  and e.get("args", {}).get("name") == "XLA Ops"}

    durs: Dict[str, Dict] = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if op_threads and (e.get("pid"), e.get("tid")) not in op_threads:
            continue
        name = e.get("name", "")
        # keep only HLO-op rows: python frames start with "$", dispatch
        # wrappers with "PjitFunction(", and every runtime-internal row
        # ("Handle inputs", "end: ...", "Foo::Bar") contains a space or colon
        # — HLO op names never do. Loop containers ("while...") enclose
        # their body ops, which are logged separately: counting both would
        # double the total.
        if (not name or name.startswith("$") or " " in name or ":" in name
                or name.startswith("PjitFunction")
                or name.startswith("while")
                or name in ("ParseArguments", "CollectGarbage")):
            continue
        args = e.get("args", {})
        rec = durs.setdefault(name, {
            "us": 0.0, "flops": 0.0, "bytes": 0.0,
            "category": args.get("hlo_category", ""),
            "source": args.get("source", "")})
        rec["us"] += float(e["dur"])
        # xprof totals (model_flops/bytes_accessed cover the event's whole
        # dur across loop iterations, so rate = flops/us stays correct)
        rec["flops"] += float(args.get("model_flops", 0) or 0)
        rec["bytes"] += float(args.get("bytes_accessed", 0) or 0)

    def category(name: str, rec) -> str:
        if rec["category"]:
            return rec["category"]
        base = name.split(".")[0].split("(")[0]
        for key in ("fusion", "convolution", "conv", "dot", "copy",
                    "all-reduce", "all-gather", "reduce-scatter", "scatter",
                    "gather", "transpose", "reshape", "rng",
                    "dynamic-update-slice", "dynamic-slice"):
            if key in base:
                return key
        return base or "other"

    total = sum(r["us"] for r in durs.values())
    by_cat: Dict[str, float] = {}
    for n, r in durs.items():
        c = category(n, r)
        by_cat[c] = by_cat.get(c, 0.0) + r["us"]
    ops = sorted(durs.items(), key=lambda kv: -kv[1]["us"])[:top]
    return {"total_us": total,
            "ops": [(n, r["us"], 100.0 * r["us"] / total if total else 0.0)
                    for n, r in ops],
            "op_details": [
                {"name": n, "us": r["us"],
                 "pct": 100.0 * r["us"] / total if total else 0.0,
                 "category": r["category"],
                 "tflops": (r["flops"] / r["us"] / 1e6
                            if r["us"] and r["flops"] else 0.0),
                 "gbps": (r["bytes"] / r["us"] / 1e3
                          if r["us"] and r["bytes"] else 0.0),
                 "source": r["source"]}
                for n, r in ops],
            "by_category": dict(sorted(by_cat.items(),
                                       key=lambda kv: -kv[1]))}
