"""Data-parallel training over a device mesh.

The reference has no distributed training at all (SURVEY.md §2.9); this is
the TPU-native scaling story: parameters/optimizer state replicated, batch
(and the time-folded frame batch — frames shard exactly like batch, §5.7)
sharded over the mesh `data` axis. The train step itself is unchanged — XLA's
SPMD partitioner inserts the gradient all-reduces and BN-moment reductions
over ICI from the input shardings alone.

The `model` mesh axis is plumbed but unused at this model scale (<20M params);
tensor-parallel shardings can be added per-layer later without touching the
step functions.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gifgan_tpu.core.mesh import DATA_AXIS, data_sharding, replicated_sharding


def shard_train_state(mesh: Mesh, ts):
    """Replicate all train state over the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), ts)


def shard_batch_arrays(mesh: Mesh, *arrays):
    """Place host arrays batch-sharded over the data axis."""
    out = tuple(
        jax.device_put(a, data_sharding(mesh, ndim=a.ndim)) for a in arrays)
    return out if len(out) > 1 else out[0]


def make_sharded_sampler(sample_fn: Callable, mesh: Mesh, *,
                         static_args: dict) -> Callable:
    """Data-parallel inference: shard a sampler's z batch over the mesh
    `data` axis with the parameter tree replicated.

    sample_fn signature: (tree, z, **static_args) -> array whose axis 0 is
    the batch (e.g. train/vid.sample_videos, or the int8 sample_q from
    quantize_sampler). Inference has no cross-batch coupling (BN uses
    running moments), so sharding is a pure layout change — outputs match
    single-device execution; tests/test_sharding.py pins it. The output
    stays batch-sharded so per-shard post-processing never gathers.
    """
    rep = replicated_sharding(mesh)
    n_data = mesh.shape[DATA_AXIS]
    sample_fn = getattr(sample_fn, "__wrapped__", sample_fn)

    def bound(tree, z):
        return sample_fn(tree, z, **static_args)

    compiled_cache = {}

    def call(tree, z):
        if z.shape[0] % n_data:
            raise ValueError(
                f"the mesh data axis ({n_data}) must divide the sampler "
                f"batch ({z.shape[0]}); grow --batch-size to a multiple "
                f"of {n_data} or shrink the mesh")
        if z.shape not in compiled_cache:
            tree_sh = jax.tree_util.tree_map(lambda _: rep, tree)
            compiled_cache[z.shape] = jax.jit(
                bound,
                in_shardings=(tree_sh, data_sharding(mesh, ndim=z.ndim)),
                out_shardings=NamedSharding(mesh, P(DATA_AXIS)))
        return compiled_cache[z.shape](tree, z)

    return call


def make_sharded_step(step_fn: Callable, mesh: Mesh, *, static_args: dict,
                      donate_state: bool = True,
                      batch_axis: int = 0,
                      state_shardings: Any = None,
                      pass_knobs: bool = False) -> Callable:
    """Wrap a (ts, *batch_arrays, rng, **static) step into a pjit'd function
    with explicit shardings: state replicated, batch data-sharded, rng
    replicated.

    step_fn signature: (ts, *arrays, rng, **static_args) -> (ts, metrics).
    batch_axis: which array axis shards over the mesh `data` axis — 0 for
    plain (B, ...) batches, 1 for chunked (K, B, ...) stacks (train_chunk).
    state_shardings: optional sharding pytree for ts (e.g.
    tp.vid_state_tp_shardings for a DP x TP step); default replicates.
    pass_knobs: the wrapped call gains a trailing runtime-knobs pytree of
    scalars (train/vid.py Knobs — the collapse controller's traced levers),
    replicated over the mesh and forwarded as step_fn(..., knobs=knobs).
    Knob VALUE changes never recompile; only flipping pass_knobs does.
    """
    rep = replicated_sharding(mesh)
    # unwrap an already-jitted step so we re-jit with explicit shardings
    step_fn = getattr(step_fn, "__wrapped__", step_fn)

    def bound(ts, *args):
        if pass_knobs:
            *arrays, rng, knobs = args
            return step_fn(ts, *arrays, rng, knobs=knobs, **static_args)
        *arrays, rng = args
        return step_fn(ts, *arrays, rng, **static_args)

    def _batch_sharding(a):
        spec = [None] * a.ndim
        spec[batch_axis] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    n_tail = 2 if pass_knobs else 1  # rng (+ knobs pytree) after the arrays

    def in_shardings(ts, *args):
        arrays, tail = args[:len(args) - n_tail], args[len(args) - n_tail:]
        ts_sh = (state_shardings if state_shardings is not None
                 else jax.tree_util.tree_map(lambda _: rep, ts))
        arr_sh = tuple(_batch_sharding(a) for a in arrays)
        tail_sh = tuple(jax.tree_util.tree_map(lambda _: rep, t)
                        for t in tail)
        return (ts_sh,) + arr_sh + tail_sh

    compiled_cache = {}

    def call(ts, *args):
        shapes = tuple(a.shape for a in args[:len(args) - n_tail])
        if shapes not in compiled_cache:
            shardings = in_shardings(ts, *args)
            # pin the OUTPUT state layout to the input layout: without
            # out_shardings GSPMD may pick a different layout for the
            # returned state (especially TP-sharded params), and every
            # subsequent step would pay a reshard of the donated state on
            # re-entry (advisor finding r1). Metrics stay replicated
            # (sharding leaves act as pytree prefixes over the subtrees).
            compiled_cache[shapes] = jax.jit(
                bound,
                in_shardings=shardings,
                out_shardings=(shardings[0], rep),
                donate_argnums=(0,) if donate_state else (),
            )
        return compiled_cache[shapes](ts, *args)

    return call
