"""ZeRO-style fully-sharded data parallelism (FSDP) over the `data` axis.

DP (parallel/dp.py) replicates parameters and optimizer state on every
device; at reference scale that is free, but the production growth path
(docs/SCALING.md) needs the memory story: FSDP shards EVERY large state
leaf — parameters AND Adam mu/nu slots — over the same mesh `data` axis the
batch shards over, each along its largest divisible dimension. XLA's SPMD
partitioner then inserts per-layer all-gathers for weights on use and
reduce-scatters for their gradients/updates (the ZeRO-3 schedule) from the
shardings alone — the train step function is untouched, exactly like
DP/TP/SP here.

Numerically a pure layout change: losses match the replicated run bit-for-
tolerance (asserted in tests/test_sharding.py and the driver dryrun).
Memory: per-device state goes from full-model to ~1/N for every leaf above
`min_size` (small leaves — BN vectors, biases, step counters — stay
replicated: sharding them buys bytes but costs a collective each).

Composes with the existing wrappers: feed fsdp_state_shardings to
dp.make_sharded_step's state_shardings just like tp.vid_state_tp_shardings.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gifgan_tpu.core.mesh import DATA_AXIS


def _leaf_sharding(mesh: Mesh, leaf, axis: str, min_size: int
                   ) -> NamedSharding:
    """Shard the largest divisible dim of one leaf over `axis`, or
    replicate (small leaves, or nothing divisible)."""
    shape = getattr(leaf, "shape", ())
    size = getattr(leaf, "size", 0)
    n = mesh.shape[axis]
    if not shape or size < min_size:
        return NamedSharding(mesh, P())
    for d in sorted(range(len(shape)), key=lambda d: shape[d], reverse=True):
        if shape[d] % n == 0:
            spec = [None] * len(shape)
            spec[d] = axis
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def fsdp_state_shardings(mesh: Mesh, ts, axis: str = DATA_AXIS,
                         min_size: int = 2048):
    """Sharding pytree for ANY train-state pytree (VidTrainState, the image
    GAN's TrainState, ...): every array leaf >= min_size elements is sharded
    over `axis` along its largest divisible dimension; everything else is
    replicated. Adam slots mirror their params' shapes, so they pick up the
    same spec by the same rule — slot updates stay local (no gathers)."""
    return jax.tree_util.tree_map(
        lambda leaf: _leaf_sharding(mesh, leaf, axis, min_size), ts)


def place_fsdp(mesh: Mesh, ts, axis: str = DATA_AXIS, min_size: int = 2048):
    """device_put a train state according to fsdp_state_shardings."""
    return jax.tree_util.tree_map(
        jax.device_put, ts, fsdp_state_shardings(mesh, ts, axis, min_size))


def place_and_shardings(mesh: Mesh, ts, min_size: int = 2048):
    """(placed train state, matching sharding pytree) — the pair
    dp.make_sharded_step's state_shardings wants; shared by both train
    loops so the FSDP wiring cannot diverge between them."""
    if mesh is None:
        raise ValueError("--fsdp requires a device mesh; it shards state "
                         "over the `data` axis (use --data-parallel 0/N)")
    ts = place_fsdp(mesh, ts, min_size=min_size)
    return ts, fsdp_state_shardings(mesh, ts, min_size=min_size)
