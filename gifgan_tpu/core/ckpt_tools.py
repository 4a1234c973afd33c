"""Checkpoint portability tools.

The reference ships a checkpoint-format migration tool
(utils/downgrade_tf_checkpoint.py: re-save a V2 TF checkpoint as V1 for
older runtimes). The equivalents for this framework's step-dir format
(core/checkpoint.py):

  - export_flat: a checkpoint step -> ONE self-describing .npz (portable to
    any numpy-speaking consumer; the cross-version "downgrade"),
  - import_flat: that .npz -> a checkpoint step dir,
  - inspect: list keys/shapes/dtypes (the `print_tensors_in_checkpoint` of
    this world).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from gifgan_tpu.core import checkpoint as ckpt


def export_flat(ckpt_dir: str, out_path: str,
                step: Optional[int] = None) -> str:
    flat = ckpt.load_flat(ckpt_dir, step)
    step = step if step is not None else ckpt.latest_step(ckpt_dir)
    meta = json.dumps({"format": "gifgan_tpu.flat/1", "step": step,
                       "keys": sorted(flat)})
    np.savez_compressed(out_path, __meta__=np.frombuffer(
        meta.encode(), np.uint8), **flat)
    return out_path


def import_flat(npz_path: str, ckpt_dir: str,
                step: Optional[int] = None) -> str:
    with np.load(npz_path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        flat = {k: z[k] for k in z.files if k != "__meta__"}
    step = step if step is not None else meta.get("step", 0)
    # rebuild a tree shaped like the flat keys (nested dicts)
    tree: Dict = {}
    for key, val in flat.items():
        parts = key.split(ckpt.SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return ckpt.save(ckpt_dir, step, tree)


def inspect(ckpt_dir: str, step: Optional[int] = None) -> str:
    flat = ckpt.load_flat(ckpt_dir, step)
    lines = []
    total = 0
    for k in sorted(flat):
        v = flat[k]
        total += v.size
        lines.append(f"{k}  {v.shape}  {v.dtype}")
    lines.append(f"total parameters: {total:,}")
    return "\n".join(lines)
