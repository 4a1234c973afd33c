"""Multi-host initialization and process-level sharding helpers.

The reference's only cross-machine mechanism is scp/ssh file shipping
(SURVEY.md §5.8). TPU-native multi-host training uses `jax.distributed`
(one process per host, devices fused into one global mesh; gradients ride
ICI, the input pipeline shards per host over DCN). These helpers wrap the
boilerplate; they are inert on a single host.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process. No-ops (returns
    False) when single-process. Env-var driven by default (JAX reads
    COORDINATOR_ADDRESS etc. on TPU pods automatically)."""
    import jax

    if num_processes is None and coordinator_address is None:
        # on Cloud TPU pods jax.distributed.initialize() autodetects
        if os.environ.get("TPU_WORKER_HOSTNAMES") in (None, "", "localhost"):
            return False
        try:
            jax.distributed.initialize()
            return True
        except Exception:
            return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def process_shard(items: Sequence, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> list:
    """Deterministically shard a work list (files, clips) across hosts —
    host i takes items[i::n]. The multi-host analog of the reference's
    manual input-dir sharding + stat merging (stat_combination.py)."""
    import jax

    i = process_index if process_index is not None else jax.process_index()
    n = process_count if process_count is not None else jax.process_count()
    return list(items)[i::n]


def global_batch_to_local(global_batch: int,
                          process_count: Optional[int] = None) -> int:
    import jax

    n = process_count if process_count is not None else jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    return global_batch // n
