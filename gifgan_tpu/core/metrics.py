"""Structured metrics & run logging.

The reference logs via stdout prints + TF summaries (SURVEY.md §5.5). Here:
JSONL metrics stream per run dir (machine-readable), stdout mirror, and live
steps/sec — replacing the reference's post-hoc `time:`-field log scraping
(models/recurrent_z/time_script.py:6-18). Per-step device timing lives in
core.profile.StepTimes (the relay-safe scalar-fetch sync).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


class MetricsLogger:
    def __init__(self, run_dir: Optional[str] = None, name: str = "train",
                 print_every: int = 1):
        self.run_dir = run_dir
        self.print_every = print_every
        self._file = None
        if run_dir:
            os.makedirs(run_dir, exist_ok=True)
            self._file = open(os.path.join(run_dir, f"{name}_metrics.jsonl"),
                              "a", buffering=1)
        self._t0 = time.time()
        self._last_time = self._t0
        self._last_step = 0

    def log(self, step: int, metrics: Dict[str, Any]) -> Dict[str, float]:
        now = time.time()
        scalars = {}
        for k, v in metrics.items():
            try:
                scalars[k] = float(np.asarray(jax.device_get(v)))
            except (TypeError, ValueError):
                scalars[k] = v
        dt = now - self._last_time
        dsteps = step - self._last_step
        if dsteps > 0 and dt > 0:
            scalars["steps_per_sec"] = dsteps / dt
        scalars["step"] = step
        scalars["wall_time"] = now - self._t0
        self._last_time, self._last_step = now, step
        if self._file:
            self._file.write(json.dumps(scalars) + "\n")
        if self.print_every and step % self.print_every == 0:
            parts = [f"step {step}"]
            for k, v in scalars.items():
                if k in ("step", "wall_time"):
                    continue
                if isinstance(v, float):
                    parts.append(f"{k}: {v:.4f}")
            print("  ".join(parts), flush=True)
        return scalars

    def close(self):
        if self._file:
            self._file.close()
