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
    # biases / BN vectors stay REPLICATED: they are tiny (C elements — no
    # memory to save), and model-sharding them forces their batch-reduced
    # grads (partial sums sharded over data x seq) through a reshard GSPMD
    # can only express as replicate-then-repartition ("involuntary full
    # rematerialization" warnings on the 3-axis mesh, MULTICHIP_r02; round-2
    # verdict item 4). Shard only the matmul/conv weights — the scaling-book
    # recipe — and let vector grads resolve as plain all-reduces.
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


def _path_keys(path):
    """Flatten a tree_map_with_path path into its string keys (DictKey.key,
    GetAttrKey.name, SequenceKey.idx)."""
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "name"):
            out.append(str(p.name))
        elif hasattr(p, "idx"):
            out.append(str(p.idx))
    return out


def opt_state_tp_shardings(mesh: Mesh, opt_state):
    """Sharding pytree for an optax state whose `mu`/`nu` subtrees mirror
    the trainable params: each slot leaf gets the SAME channel sharding its
    param would (Adam's update is elementwise, so matching specs make the
    slot update local — replicated slots for sharded params force gathers
    every step; round-1 verdict item 4). `count` and any other scalar
    bookkeeping stay replicated."""
    rep = NamedSharding(mesh, P())

    def f(path, leaf):
        keys = _path_keys(path)
        if "mu" in keys or "nu" in keys:
            return _leaf_sharding(mesh, path, leaf)
        return rep

    return jax.tree_util.tree_map_with_path(f, opt_state)


def vid_state_tp_shardings(mesh: Mesh, ts, full: bool = False):
    """Sharding pytree for a train/vid.py VidTrainState on a 2-D (data,
    model) mesh. Feed to dp.make_sharded_step's state_shardings for a
    combined DP x TP step — numerically a pure layout change vs the
    replicated run (asserted in the driver dryrun AND CI).

    full=False (round-3 behavior): only the nested image GAN's conv/deconv/
    linear weights are channel-sharded over `model`; vid nets, BN state and
    optimizer slots stay replicated.

    full=True: additionally shards (a) the vid generator's linear stack and
    the vid discriminator's conv3d stack (kernels are [d,h,w,in,out] — last
    axis is out-channels, same column-parallel layout), and (b) the Adam
    slots with specs matching their params via opt_state_tp_shardings."""
    rep = NamedSharding(mesh, P())

    def sh(path, leaf):
        return _leaf_sharding(mesh, path, leaf)

    everything_rep = jax.tree_util.tree_map(lambda _: rep, ts)
    params_sh = everything_rep.params._replace(
        img_generator=jax.tree_util.tree_map_with_path(
            sh, ts.params.img_generator),
        img_discriminator=jax.tree_util.tree_map_with_path(
            sh, ts.params.img_discriminator))
    if full:
        params_sh = params_sh._replace(
            vid_generator=jax.tree_util.tree_map_with_path(
                sh, ts.params.vid_generator),
            vid_discriminator=jax.tree_util.tree_map_with_path(
                sh, ts.params.vid_discriminator))
        return everything_rep._replace(
            params=params_sh,
            opt_g=opt_state_tp_shardings(mesh, ts.opt_g),
            opt_d=opt_state_tp_shardings(mesh, ts.opt_d))
    return everything_rep._replace(params=params_sh)


def place_vid_state_tp(mesh: Mesh, ts, full: bool = False):
    """device_put a VidTrainState according to vid_state_tp_shardings."""
    return jax.tree_util.tree_map(jax.device_put, ts,
                                  vid_state_tp_shardings(mesh, ts, full))
