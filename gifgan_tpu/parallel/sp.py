"""Sequence parallelism: shard the time axis of video clips over the mesh.

The reference is single-GPU and its videos are 16 frames (z_model.py:28);
nothing there shards time. The TPU-native design already folds time into
batch everywhere (SURVEY.md §5.7) — frames ride the `data` axis like batch —
but that only scales while the CLIP count covers the mesh. Sequence
parallelism covers the other regime: few (even one) long clips, where the
frames of a SINGLE clip must spread over devices.

Layout. Folded frame stacks are (B*T, ...) with rows ordered b-major/
t-minor (vid_dcgan.py: z_copied.reshape(b*t, ...)). Sharding that axis with
the COMPOSITE spec P(("data", "seq")) assigns each device one contiguous
row range. With `data_parallel == B` (one clip per data slice — the pure-SP
regime) a device's range is exactly T/seq frames of one clip: the `data`
axis shards clips, the `seq` axis shards time WITHIN each clip. No step
function changes — XLA's SPMD partitioner handles everything the layout
implies:

  - per-frame ops (vid-G MLP rows, image G/D convs) stay fully local;
  - BatchNorm moments over the folded batch become cross-device psums over
    (data, seq) — still the exact full-batch statistics;
  - the video discriminator's reshape to (B, T, h, w, c) splits the folded
    axis back into B-over-`data` x T-over-`seq` (communication-free in the
    pure-SP regime since b is the high-order digit of the row index), and
    its stride-2 3x3x3 conv3ds get halo exchanges over `seq` for the
    2-frame window overlap;
  - first_frame_loss's [::T] strided slice gathers frame 0 from the first
    `seq` slice.

With `data_parallel < B` each data slice holds B/data clips and the seq
splits cover whole clips first (the composite range only enters a clip's
interior once B/data clips don't divide evenly) — still correct, just
degenerating toward plain DP; the pure regime is the interesting one and is
what the parity tests and the driver dryrun pin.

Numerically a pure layout change: losses must match the single-device step
(asserted in tests/test_sp.py and the driver dryrun)."""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gifgan_tpu.core.mesh import DATA_AXIS, SEQ_AXIS, replicated_sharding


def folded_seq_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0,
                        ) -> NamedSharding:
    """Sharding for a time-folded (B*T, ...) stack: the folded axis rides
    BOTH the data and seq mesh axes (data-major composite, matching the
    b-major row order)."""
    spec = [None] * ndim
    spec[batch_axis] = (DATA_AXIS, SEQ_AXIS)
    return NamedSharding(mesh, P(*spec))


def clip_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Sharding for per-clip arrays (B, ...): clips over `data` only (time
    doesn't exist in these; the seq axis replicates them)."""
    spec = [None] * ndim
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_vid_batch(mesh: Mesh, frames, z, batch_axis: int = 0):
    """Place a (frames, z) pair for a sequence-parallel step: frames'
    folded axis over (data, seq), z's clip axis over data."""
    f = jax.device_put(frames,
                       folded_seq_sharding(mesh, frames.ndim, batch_axis))
    zz = jax.device_put(z, clip_sharding(mesh, z.ndim, batch_axis))
    return f, zz


def vid_d_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Layout wall for the video discriminator's folded activation inputs:
    batch over `data` ONLY (time gathered over `seq`). The per-frame image
    stack carries the (data, seq) composite — that is where the FLOPs are —
    but the vid-D's stride-2 conv3ds shrink the time axis toward 1, below
    the seq axis size, and GSPMD resolves seq-sharded size-1 cotangent dims
    with replicate-then-repartition warnings (MULTICHIP_r02; round-2
    verdict item 4). Pass as train_step's static fold_sharding so both the
    real and fake activations hit the same wall before the vid-D."""
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def make_sp_step(step_fn: Callable, mesh: Mesh, *, static_args: dict,
                 donate_state: bool = True, batch_axis: int = 0,
                 state_shardings: Any = None,
                 pass_knobs: bool = False) -> Callable:
    """Wrap a (ts, frames, z, rng, **static) step into a jitted function
    whose frames shard over (data, seq) and z over data. Mirrors
    dp.make_sharded_step (same donation/out-sharding pinning); composes
    with TP via state_shardings (tp.vid_state_tp_shardings) for a
    DP x SP x TP step.

    step_fn signature: (ts, frames, z, rng, **static_args) -> (ts, metrics).
    batch_axis: 0 for train_step's (B*T, ...) frames / (B, ...) z, 1 for
    train_chunk's (K, B*T, ...) / (K, B, ...) stacks.
    pass_knobs: the wrapped call gains a trailing runtime-knobs pytree
    (train/vid.py Knobs), replicated over the mesh and forwarded as
    step_fn(..., knobs=knobs) — same contract as dp.make_sharded_step, so
    the collapse controller works under sequence parallelism too.

    Pass static_args["fold_sharding"] = vid_d_sharding(mesh) so the vid
    discriminator sees data-only folded activations (the layout wall that
    keeps the 3-axis compile free of SPMD rematerialization warnings).
    """
    rep = replicated_sharding(mesh)
    step_fn = getattr(step_fn, "__wrapped__", step_fn)

    def bound(ts, frames, z, *tail):
        if pass_knobs:
            rng, knobs = tail
            return step_fn(ts, frames, z, rng, knobs=knobs, **static_args)
        (rng,) = tail
        return step_fn(ts, frames, z, rng, **static_args)

    compiled_cache = {}

    def call(ts, frames, z, *tail):
        shapes = (frames.shape, z.shape)
        if shapes not in compiled_cache:
            ts_sh = (state_shardings if state_shardings is not None
                     else jax.tree_util.tree_map(lambda _: rep, ts))
            tail_sh = tuple(jax.tree_util.tree_map(lambda _: rep, t)
                            for t in tail)
            shardings = (ts_sh,
                         folded_seq_sharding(mesh, frames.ndim, batch_axis),
                         clip_sharding(mesh, z.ndim, batch_axis)) + tail_sh
            compiled_cache[shapes] = jax.jit(
                bound,
                in_shardings=shardings,
                out_shardings=(ts_sh, rep),
                donate_argnums=(0,) if donate_state else (),
            )
        return compiled_cache[shapes](ts, frames, z, *tail)

    return call
