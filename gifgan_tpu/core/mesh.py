"""Device mesh and sharding helpers.

The reference is single-process/single-GPU (SURVEY.md §2.9). The TPU-native
design scales via a `jax.sharding.Mesh` with a `data` axis (batch / folded
time-batch sharding over ICI) and a `model` axis reserved for tensor
parallelism. Train steps are plain `jax.jit` functions whose inputs/outputs
carry `NamedSharding`s; XLA inserts the gradient all-reduces over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data_parallel: int = 0,
    model_parallel: int = 1,
    seq_parallel: int = 1,
) -> Mesh:
    """Build a (data, seq, model) mesh.

    data_parallel == 0 means "all remaining devices on the data axis".
    The `seq` axis shards the time dimension of video clips (sequence
    parallelism, parallel/sp.py); it is size 1 unless requested, so plain
    DP/TP meshes carry it inertly (a size-1 axis never shards anything).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model_parallel <= 0:
        model_parallel = 1
    if seq_parallel <= 0:
        seq_parallel = 1
    if data_parallel <= 0:
        data_parallel = n // (model_parallel * seq_parallel)
    if data_parallel * model_parallel * seq_parallel != n:
        raise ValueError(
            f"mesh {data_parallel}x{seq_parallel}x{model_parallel} "
            f"!= {n} devices")
    arr = np.asarray(devices).reshape(data_parallel, seq_parallel,
                                      model_parallel)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over the data axis, replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch dim sharded over `data`."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, ndim=x.ndim)), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
