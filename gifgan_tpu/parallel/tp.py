"""Tensor-parallel parameter shardings for the DCGAN nets.

At reference scale TP is not worth its collectives (SURVEY.md §2.9), but the
`model` mesh axis is real: these helpers place conv/deconv/linear weights
channel-sharded over it and let XLA's SPMD partitioner insert the
all-gathers/reduces. Layout choice: shard the OUTPUT channels of every conv
stage (HWIO's O; deconv kernels are [h, w, out, in] so axis 2) — activations
then carry a sharded channel dim layer-to-layer and only the tap/logit
boundaries gather.

Numerically a pure layout change: outputs must match the replicated run
(asserted in tests/test_sharding.py).
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gifgan_tpu.core.mesh import MODEL_AXIS


def _spec_for(path_key: str, shape) -> P:
    nd = len(shape)
    if path_key == "w":
        # last axis: out-channels for conv (HWIO) — column-parallel; in-
        # channels for deconv ([h,w,out,in]) — row-parallel (psum over the
        # contraction). Both are valid TP layouts; XLA inserts the matching
        # collectives either way.
        if nd in (2, 4, 5):
            return P(*([None] * (nd - 1) + [MODEL_AXIS]))
    if nd == 1:          # biases / bn vectors follow output channels
        return P(MODEL_AXIS)
    return P()


def _leaf_sharding(mesh: Mesh, path, leaf) -> NamedSharding:
    """NamedSharding for one param leaf: channel-sharded per _spec_for,
    replicated when the sharded dim isn't divisible by the `model` axis."""
    key = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    spec = _spec_for(key, leaf.shape)
    axis_size = mesh.shape[MODEL_AXIS]
    for dim, name in enumerate(spec):
        if name == MODEL_AXIS and leaf.shape[dim] % axis_size != 0:
            spec = P()
            break
    return NamedSharding(mesh, spec)


def shard_dcgan_params_tp(mesh: Mesh, params: Dict) -> Dict:
    """Place a DCGAN generator/discriminator param dict with channel-sharded
    weights over the `model` axis. BN running state should stay replicated
    (pass only params here)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf,
                                          _leaf_sharding(mesh, path, leaf)),
        params)


def vid_state_tp_shardings(mesh: Mesh, ts):
    """Sharding pytree for a train/vid.py VidTrainState on a 2-D (data,
    model) mesh: the nested image GAN's conv/deconv/linear weights
    channel-sharded over `model`, everything else (vid nets, BN state,
    optimizer slots) replicated. Feed to dp.make_sharded_step's
    state_shardings for a combined DP x TP step — numerically a pure layout
    change vs the replicated run."""
    rep = NamedSharding(mesh, P())

    def img_sh(path, leaf):
        return _leaf_sharding(mesh, path, leaf)

    everything_rep = jax.tree_util.tree_map(lambda _: rep, ts)
    params_sh = everything_rep.params._replace(
        img_generator=jax.tree_util.tree_map_with_path(
            img_sh, ts.params.img_generator),
        img_discriminator=jax.tree_util.tree_map_with_path(
            img_sh, ts.params.img_discriminator))
    return everything_rep._replace(params=params_sh)


def place_vid_state_tp(mesh: Mesh, ts):
    """device_put a VidTrainState according to vid_state_tp_shardings."""
    return jax.tree_util.tree_map(jax.device_put, ts,
                                  vid_state_tp_shardings(mesh, ts))
