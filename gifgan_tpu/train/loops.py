"""Full training loops: epochs, sample grids, checkpoints, metrics, resume.

The reference's loop behaviors (model.py:143-266, z_model_lib.py:148-259):
per-epoch batch iteration, sample grid every `sample_every` steps, checkpoint
every `checkpoint_every` with max_to_keep GC, best-effort resume from the
latest checkpoint at start, face x expression cross-grid samples when the
first-frame loss is active (z_model_lib.py:187-201), and the std diagnostics
printed per step. Data feeding is prefetched+device-put (vs the reference's
inline cv2 decode in the hot loop — its dominant stall, SURVEY.md §3.2).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gifgan_tpu.core import checkpoint as ckpt
from gifgan_tpu.core.config import (DCGANConfig, TrainConfig, VidGANConfig,
                                    RecurrentImageConfig, save_config)
from gifgan_tpu.core.metrics import MetricsLogger
from gifgan_tpu.core.rng import PRNGSequence, uniform_z
from gifgan_tpu.data.loader import PrefetchLoader
from gifgan_tpu.ops.image import (denorm_u8, inverse_transform,
                                  merge_grid, to_uint8)


def _resume_rngs(seed: int, start_step: int) -> PRNGSequence:
    """Key stream for a (possibly resumed) run. Folding the restored step
    into the seed keeps resume segments decorrelated — restarting from
    PRNGSequence(seed) would replay the exact z/noise stream already consumed
    before the checkpoint (ADVICE round 1)."""
    if start_step:
        return PRNGSequence(jax.random.fold_in(jax.random.PRNGKey(seed),
                                               start_step))
    return PRNGSequence(seed)


def _epoch_iter(factory: Callable, epoch_seed: int) -> Iterator[np.ndarray]:
    """Call a data-iterator factory, passing a per-epoch/per-resume-segment
    seed when the factory accepts one (so shuffles differ across epochs and
    across resume segments)."""
    import inspect

    try:
        if len(inspect.signature(factory).parameters) >= 1:
            return factory(epoch_seed)
    except (TypeError, ValueError):
        pass
    return factory()


def _restore_controller(controller, metrics_path: str,
                        max_step: Optional[int] = None) -> None:
    """Replay auto-intervention events from a run's metrics log so a resumed
    CollapseController starts at the knob levels the run last trained at
    (policy counters restart conservatively; the endurance script uses the
    same protocol on its own run log).

    max_step: only replay events at or before the restored checkpoint's step
    (log.log stamps every record). Checkpoints are periodic but events are
    per chunk, so a crash between an intervention and the next checkpoint
    leaves stale post-checkpoint events in the log — they belong to a lost
    tail about to be re-trained, and replaying them would resume the
    pre-intervention weights at post-intervention knob levels (ADVICE r2)."""
    import json

    try:
        with open(metrics_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("kind") == "auto_intervention" and (
                        max_step is None
                        or rec.get("step", max_step + 1) <= max_step):
                    controller.image_noise = rec["image_noise_std"]
                    controller.activation_noise = rec["activation_noise_std"]
                    controller.d_lr_scale = rec["d_lr_scale"]
    except OSError:
        pass


def _crossed(prev_step: int, step: int, every: int) -> bool:
    """True when [prev_step+1, step] contains a multiple of `every` — chunked
    loops advance k steps at once and epoch-tail partial flushes shift step
    off the multiple grid, so `step % every == 0` would silently stop firing
    (round-2 review finding)."""
    return bool(every) and (step // every) > (prev_step // every)


def _save_grid(samples: np.ndarray, rows: int, cols: int, path: str,
               from_range: str = "[-1,1]") -> None:
    import imageio.v2 as imageio

    import jax.numpy as jnp

    x = jnp.asarray(samples)
    if from_range == "[-1,1]":
        x = inverse_transform(x)
    grid = to_uint8(merge_grid(x, rows, cols))
    imageio.imwrite(path, np.asarray(grid))


def cross_sample_z(rows: int, cols: int, z_in: int, z_out: int,
                   rng: np.random.Generator) -> np.ndarray:
    """Face x expression grid (z_model_lib.py:187-201): each row shares a
    face latent (dims :z_out), each column an expression latent (z_out:)."""
    face = rng.uniform(-1, 1, (rows, 1, z_out))
    face = np.repeat(face, cols, axis=1)
    expr = rng.uniform(-1, 1, (1, cols, z_in - z_out))
    expr = np.repeat(expr, rows, axis=0)
    return np.concatenate([face, expr], axis=2).reshape(rows * cols, z_in)


def train_dcgan(images_iter: Callable[[], Iterator[np.ndarray]],
                cfg: DCGANConfig, tcfg: TrainConfig,
                mesh=None, resume: bool = True,
                steps_limit: Optional[int] = None,
                chunk: int = 1,
                stills_u8: Optional[np.ndarray] = None,
                fsdp: bool = False, fsdp_min_size: int = 2048):
    """images_iter: () -> iterator of (B, s, s, c) float [-1,1] batches (one
    pass = one epoch). Returns the final TrainState.

    chunk>1 runs K batches as one XLA program (gan.train_chunk) — same
    dispatch amortization as the vid loop (train/vid.py measurements).

    stills_u8: device-resident fast path — a (N, s, s, c) uint8 corpus that
    fits in HBM is uploaded ONCE and every chunk's (K, B, s, s, c) batch is
    gathered + scaled on device (data/device.py DeviceCorpus); the host
    ships only (K, B) int32 ids per chunk instead of frame pixels. On a
    1-core host behind the ~35 MB/s axon relay the per-step f32 upload is
    the whole bottleneck (~4 steps/s at the reference shape); this path
    makes the loop compute-bound. Epoch/shuffle semantics are preserved
    (per-epoch id permutation, same per-epoch seeds); images_iter is
    ignored. Single-device for now (mesh must be None)."""
    from gifgan_tpu.parallel.dp import (make_sharded_step, shard_batch_arrays,
                                        shard_train_state)
    from gifgan_tpu.train import gan

    run_dir = tcfg.run_dir
    os.makedirs(run_dir, exist_ok=True)
    save_config({"model": cfg, "train": tcfg},
                os.path.join(run_dir, "params.json"))
    rngs = PRNGSequence(tcfg.seed)
    ts = gan.init_train_state(rngs.next(), cfg, tcfg)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    if resume and ckpt.latest_step(ckpt_dir) is not None:
        tree = ckpt.restore(ckpt_dir, ts._asdict())
        ts = gan.TrainState(**tree)
        print(f"resumed from step {int(ts.step)}")
        rngs = _resume_rngs(tcfg.seed, int(ts.step))

    if fsdp and mesh is None:
        raise ValueError("fsdp=True requires a device mesh "
                         "(--data-parallel 0 or N, not 1)")
    if mesh is not None:
        state_sh = None
        if fsdp:
            # ZeRO-3 layout (parallel/fsdp.py): params + Adam slots sharded
            # over the same `data` axis as the batch
            from gifgan_tpu.parallel.fsdp import place_and_shardings

            ts, state_sh = place_and_shardings(mesh, ts,
                                               min_size=fsdp_min_size)
        else:
            ts = shard_train_state(mesh, ts)
        step_fn = make_sharded_step(gan.train_step, mesh,
                                    static_args={"cfg": cfg, "tcfg": tcfg},
                                    state_shardings=state_sh)
        chunk_fn = make_sharded_step(gan.train_chunk, mesh,
                                     static_args={"cfg": cfg, "tcfg": tcfg},
                                     batch_axis=1,
                                     state_shardings=state_sh) \
            if chunk > 1 else None
    else:
        step_fn = lambda *a: gan.train_step(*a, cfg, tcfg)
        chunk_fn = ((lambda *a: gan.train_chunk(*a, cfg, tcfg))
                    if chunk > 1 else None)

    corpus = None
    if stills_u8 is not None:
        from gifgan_tpu.data.device import DeviceCorpus

        # mesh-aware: the corpus replicates over the mesh and sampled
        # batches come back sharded over `data` (host still ships only ids)
        corpus = DeviceCorpus(np.ascontiguousarray(stills_u8), mesh=mesh)
        if corpus.n < tcfg.batch_size:
            raise ValueError(f"stills_u8 has {corpus.n} items "
                             f"< batch_size {tcfg.batch_size}")

    def _corpus_id_batches(epoch_seed: int) -> Iterator[np.ndarray]:
        """One epoch = one shuffled pass over corpus ids, full batches only
        (model.py:143-266 drops the epoch tail too). Same epoch-seed protocol
        as _epoch_iter so shuffles differ across epochs/resume segments."""
        perm = np.random.default_rng(epoch_seed).permutation(corpus.n)
        for i in range(corpus.n // tcfg.batch_size):
            yield perm[i * tcfg.batch_size:(i + 1) * tcfg.batch_size]

    sample_z = uniform_z(rngs.next(), (64, cfg.z_dim))
    log = MetricsLogger(run_dir)
    saver = ckpt.AsyncCheckpointer()  # disk write overlaps the next steps
    step = int(jax.device_get(ts.step))
    start_step = step
    pending_images, pending_z = [], []

    def flush_pending():
        nonlocal ts, step
        if not pending_images:
            return
        k = len(pending_images)
        istack, zstack = np.stack(pending_images), np.stack(pending_z)
        pending_images.clear()
        pending_z.clear()
        if corpus is not None and mesh is None:
            # single device: per-step in-scan gather (gan.train_chunk_ids)
            # — peak image memory is one (B, ...) batch, not the (k, B,
            # ...) stack
            ts, metrics = gan.train_chunk_ids(
                ts, jnp.asarray(istack, jnp.int32), zstack, rngs.next(),
                corpus.data, cfg, tcfg, sample_fn=corpus.sample_fn)
        else:
            if corpus is not None:
                # mesh: sampled stack comes back sharded over `data`
                istack = corpus.sample(istack)
            ts, metrics = chunk_fn(ts, istack, zstack, rngs.next())
        step += k
        log.log(step, {key: v[-1] for key, v in metrics.items()})

    for epoch in range(tcfg.epochs):
        epoch_seed = tcfg.seed + start_step + epoch
        batches = (_corpus_id_batches(epoch_seed) if corpus is not None
                   else PrefetchLoader(_epoch_iter(images_iter, epoch_seed)))
        for batch in batches:
            batch = np.asarray(batch)
            z = uniform_z(rngs.next(), (batch.shape[0], cfg.z_dim))
            prev_step = step
            if chunk_fn is not None:
                pending_images.append(batch)
                pending_z.append(np.asarray(z))
                if len(pending_images) < chunk:
                    continue
                flush_pending()
            else:
                if corpus is not None:
                    batch = corpus.sample(batch)
                elif mesh is not None:
                    batch = shard_batch_arrays(mesh, batch)
                ts, metrics = step_fn(ts, batch, z, rngs.next())
                step += 1
                log.log(step, metrics)
            if _crossed(prev_step, step, tcfg.sample_every):
                samples = gan.sample_step(ts, sample_z, cfg)
                _save_grid(np.asarray(samples), 8, 8,
                           os.path.join(run_dir,
                                        f"train_{epoch:02d}_{step:06d}.png"))
            if _crossed(prev_step, step, tcfg.checkpoint_every):
                saver.save(ckpt_dir, step, ts._asdict(),
                           max_to_keep=tcfg.max_checkpoints_to_keep)
            if steps_limit and step >= steps_limit:
                break
        if chunk_fn is not None:
            flush_pending()  # epoch-tail partial chunk
        if steps_limit and step >= steps_limit:
            break
    saver.save(ckpt_dir, step, ts._asdict(),
               max_to_keep=tcfg.max_checkpoints_to_keep)
    saver.close()
    log.close()
    return ts


def train_vid_dcgan(clips_iter: Callable[[], Iterator[np.ndarray]],
                    cfg: VidGANConfig, tcfg: TrainConfig,
                    image_gan_ckpt: Optional[str] = None,
                    mesh=None, resume: bool = True,
                    steps_limit: Optional[int] = None,
                    chunk: int = 1,
                    clips_u8: Optional[np.ndarray] = None,
                    fsdp: bool = False, fsdp_min_size: int = 2048,
                    auto_intervene: bool = False):
    """clips_iter yields time-folded (B*T, s, s, c) float [-1,1] batches.

    chunk>1 accumulates K batches and runs them as ONE XLA program
    (train_chunk) — ~2x throughput at flagship scale (host dispatch costs as
    much as the math per step). Sampling/checkpoint cadence then lands on
    chunk boundaries.

    clips_u8: device-resident fast path — a (N, T, s, s, c) uint8 clip
    corpus uploaded ONCE to HBM; each chunk's (K, B*T, s, s, c) frames are
    gathered + scaled + time-folded on device (data/device.py DeviceCorpus,
    the endurance loop's data path: examples/endurance_run.py). The host
    ships (K, B) int32 clip ids per chunk instead of ~4 GB of frames — a
    1-core host feeding the flagship loop through decode sustains ~12.5
    steps/s vs the chip's 40.5 (BASELINE.md loader row); this path makes
    the loop compute-bound on any host. Epoch/shuffle semantics preserved;
    clips_iter is ignored. Single-device (mesh must be None).

    auto_intervene: closed-loop collapse controller (train/controller.py)
    — watches per-chunk d_loss and drives the traced runtime Knobs (noise
    stds, D-lr scale) so interventions against a saturated D cost zero
    recompiles. Composes with every feeding/parallelism path here (mesh
    steps pass the knobs through dp.make_sharded_step's pass_knobs).
    Intervention events land in train_metrics.jsonl and a resume restores
    the last intervened knob levels from it."""
    from gifgan_tpu.parallel.dp import (make_sharded_step, shard_batch_arrays,
                                        shard_train_state)
    from gifgan_tpu.train import vid as vid_train

    run_dir = tcfg.run_dir
    os.makedirs(run_dir, exist_ok=True)
    save_config({"model": cfg, "train": tcfg},
                os.path.join(run_dir, "params.json"))
    rngs = PRNGSequence(tcfg.seed)
    ts = vid_train.init_train_state(rngs.next(), cfg, tcfg)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    resumed = False
    if resume and ckpt.latest_step(ckpt_dir) is not None:
        ts = vid_train.VidTrainState(**ckpt.restore(ckpt_dir, ts._asdict()))
        print(f"resumed from step {int(ts.step)}")
        rngs = _resume_rngs(tcfg.seed, int(ts.step))
        resumed = True
    elif image_gan_ckpt:
        ts = vid_train.load_image_gan(ts, image_gan_ckpt)
        print(f"loaded frozen image GAN from {image_gan_ckpt}")

    controller = None
    knob_args = ()  # (Knobs,) when the controller is active, else empty
    if auto_intervene:
        from gifgan_tpu.train.controller import CollapseController

        controller = CollapseController(cfg.image_noise_std,
                                        cfg.activation_noise_std)
        if resumed:
            # knob levels are policy state: recover the last levels the run
            # actually trained at from the metrics log (counters restart
            # conservatively — worst case the policy re-observes for
            # `patience` chunks, examples/endurance_run.py does the same)
            _restore_controller(controller,
                                os.path.join(run_dir,
                                             "train_metrics.jsonl"),
                                max_step=int(ts.step))
        knob_args = (vid_train.make_knobs(cfg, **controller.knob_values()),)

    if fsdp and mesh is None:
        raise ValueError("fsdp=True requires a device mesh "
                         "(--data-parallel 0 or N, not 1)")
    sp_ways = 1
    if mesh is not None:
        from gifgan_tpu.core.mesh import MODEL_AXIS, SEQ_AXIS

        # the mesh IS the parallelism request: a model axis > 1 selects the
        # full TP layout (parallel/tp.py — conv/linear weights + Adam slots
        # channel-sharded), a seq axis > 1 selects the sequence-parallel
        # step wrapper (parallel/sp.py — time within each clip sharded).
        # Both compose with each other and with --auto-intervene's knobs;
        # the seven layouts are pinned in tests/test_sharding.py,
        # tests/test_sp.py and the driver dryrun.
        tp_ways = mesh.shape.get(MODEL_AXIS, 1)
        sp_ways = mesh.shape.get(SEQ_AXIS, 1)
        state_sh = None
        if fsdp:
            if tp_ways > 1:
                raise ValueError(
                    "--fsdp and --tensor-parallel shard the train state "
                    "along different mesh axes; pick one")
            from gifgan_tpu.parallel.fsdp import place_and_shardings

            ts, state_sh = place_and_shardings(mesh, ts,
                                               min_size=fsdp_min_size)
        elif tp_ways > 1:
            from gifgan_tpu.parallel.tp import (place_vid_state_tp,
                                                vid_state_tp_shardings)

            ts = place_vid_state_tp(mesh, ts, full=True)
            state_sh = vid_state_tp_shardings(mesh, ts, full=True)
        else:
            ts = shard_train_state(mesh, ts)
        if sp_ways > 1:
            from gifgan_tpu.parallel.sp import make_sp_step, vid_d_sharding

            static = {"cfg": cfg, "tcfg": tcfg,
                      "fold_sharding": vid_d_sharding(mesh)}
            step_fn = make_sp_step(vid_train.train_step, mesh,
                                   static_args=static,
                                   state_shardings=state_sh,
                                   pass_knobs=auto_intervene)
            chunk_fn = make_sp_step(vid_train.train_chunk, mesh,
                                    static_args=static, batch_axis=1,
                                    state_shardings=state_sh,
                                    pass_knobs=auto_intervene) \
                if chunk > 1 else None
        else:
            step_fn = make_sharded_step(vid_train.train_step, mesh,
                                        static_args={"cfg": cfg,
                                                     "tcfg": tcfg},
                                        state_shardings=state_sh,
                                        pass_knobs=auto_intervene)
            # chunked (K, B*T, ...) stacks shard over axis 1 — frames shard
            # like batch, the chunk axis is the lax.scan axis
            # (tests/test_sharding.py)
            chunk_fn = make_sharded_step(vid_train.train_chunk, mesh,
                                         static_args={"cfg": cfg,
                                                      "tcfg": tcfg},
                                         batch_axis=1,
                                         state_shardings=state_sh,
                                         pass_knobs=auto_intervene) \
                if chunk > 1 else None
    else:
        step_fn = (lambda ts_, f, z_, r, *kn:
                   vid_train.train_step(ts_, f, z_, r, cfg, tcfg, *kn))
        chunk_fn = ((lambda ts_, f, z_, r, *kn:
                     vid_train.train_chunk(ts_, f, z_, r, cfg, tcfg, *kn))
                    if chunk > 1 else None)

    corpus = None
    if clips_u8 is not None:
        if clips_u8.ndim != 5 or clips_u8.shape[1] != cfg.vid_length:
            raise ValueError(
                f"clips_u8 must be (N, vid_length={cfg.vid_length}, s, s, c)"
                f" uint8, got {clips_u8.shape}")
        from gifgan_tpu.data.device import DeviceCorpus

        # mesh-aware: corpus replicated over the mesh, sampled chunks come
        # back sharded over `data` along the batch axis (ids-only feeding
        # works on a pod exactly like on one chip)
        corpus = DeviceCorpus(np.ascontiguousarray(clips_u8), mesh=mesh)
        if corpus.n < tcfg.batch_size:
            raise ValueError(f"clips_u8 has {corpus.n} clips "
                             f"< batch_size {tcfg.batch_size}")

    def _corpus_id_batches(epoch_seed: int) -> Iterator[np.ndarray]:
        """One epoch = one shuffled pass over clip ids, full batches only
        (same epoch-seed protocol as _epoch_iter)."""
        perm = np.random.default_rng(epoch_seed).permutation(corpus.n)
        for i in range(corpus.n // tcfg.batch_size):
            yield perm[i * tcfg.batch_size:(i + 1) * tcfg.batch_size]

    def _fold_time(g):
        """(..., B, T, s, s, c) f32 -> (..., B*T, s, s, c): time folds into
        batch on device (the layout every train step expects)."""
        return g.reshape(g.shape[:-5] + (-1,) + g.shape[-3:])

    pending_frames, pending_z = [], []
    np_rng = np.random.default_rng(tcfg.seed)
    sample_z = np_rng.uniform(-1, 1, (tcfg.batch_size, cfg.z_input_size)
                              ).astype(np.float32)
    # rows = faces, cols = expressions — the reference's orientation
    # (sample_cols=8 expressions per face row, z_model_lib.py:187-201)
    cross_z = cross_sample_z(max(1, tcfg.batch_size // 8), min(8, tcfg.batch_size),
                             cfg.z_input_size, cfg.z_output_size,
                             np_rng).astype(np.float32)
    log = MetricsLogger(run_dir)
    saver = ckpt.AsyncCheckpointer()
    step = int(jax.device_get(ts.step))
    start_step = step

    def observe(d_loss):
        """Feed one chunk's D loss to the collapse controller; on an
        intervention swap in fresh Knobs (same compiled program — only the
        traced scalars move) and log the event to the metrics stream."""
        nonlocal knob_args
        if controller is None:
            return
        event = controller.observe(float(np.asarray(d_loss)))
        if event is not None:
            knob_args = (vid_train.make_knobs(cfg,
                                              **controller.knob_values()),)
            log.log(step, event)
            print(f"[train-vid] auto-intervention @step {step}: "
                  f"{event['action']} -> noise={controller.image_noise} "
                  f"d_lr_scale={controller.d_lr_scale}", flush=True)

    def flush_pending():
        """Train the accumulated (possibly partial) chunk as one XLA program.
        Called at chunk boundaries AND at epoch/steps_limit exit so trailing
        batches are trained and logged, not dropped (ADVICE round 1)."""
        nonlocal ts, step
        if not pending_frames:
            return
        k = len(pending_frames)
        fstack, zstack = np.stack(pending_frames), np.stack(pending_z)
        pending_frames.clear()
        pending_z.clear()
        if corpus is not None and mesh is None:
            # single device: gather each step's frames INSIDE the scan
            # body (vid.train_chunk_ids) — peak frame memory is one
            # (B*T, ...) batch, not the whole (k, B*T, ...) chunk stack
            ts, metrics = vid_train.train_chunk_ids(
                ts, jnp.asarray(fstack, jnp.int32), zstack, rngs.next(),
                corpus.data, cfg, tcfg, sample_fn=corpus.sample_fn,
                knobs=knob_args[0] if knob_args else None)
        else:
            if corpus is not None:
                # mesh: the sampled chunk comes back sharded over `data`
                # (each device holds chunk/N), so whole-chunk gather is
                # the memory-cheap layout-preserving path here
                fstack = _fold_time(corpus.sample(fstack))
            ts, metrics = chunk_fn(ts, fstack, zstack, rngs.next(),
                                   *knob_args)
        step += k
        last = {key: v[-1] for key, v in metrics.items()}
        if controller is not None:
            last.update(controller.knob_values())
        log.log(step, last)
        observe(last["d_loss"])

    for epoch in range(tcfg.epochs):
        epoch_seed = tcfg.seed + start_step + epoch
        epoch_batches = (_corpus_id_batches(epoch_seed) if corpus is not None
                         else PrefetchLoader(_epoch_iter(clips_iter,
                                                         epoch_seed)))
        for frames in epoch_batches:
            frames = np.asarray(frames)
            b = (frames.shape[0] if corpus is not None
                 else frames.shape[0] // cfg.vid_length)
            z = uniform_z(rngs.next(), (b, cfg.z_input_size))
            prev_step = step
            if chunk_fn is not None:
                pending_frames.append(frames)
                pending_z.append(np.asarray(z))
                if len(pending_frames) < chunk:
                    continue
                flush_pending()
            else:
                if corpus is not None:
                    frames = _fold_time(corpus.sample(frames))
                elif mesh is not None and sp_ways == 1:
                    # under SP the step's in_shardings place the host batch
                    # (data, seq)-folded directly; pre-placing data-only
                    # here would just add a resharding pass
                    frames = shard_batch_arrays(mesh, frames)
                ts, metrics = step_fn(ts, frames, z, rngs.next(),
                                      *knob_args)
                step += 1
                if controller is not None:
                    metrics = {**metrics, **controller.knob_values()}
                log.log(step, metrics)
                observe(metrics["d_loss"])
            if _crossed(prev_step, step, tcfg.sample_every):
                for name, zz in (("sample", sample_z),
                                 ("cross_sample", cross_z)):
                    if name == "cross_sample" and cfg.first_frame_loss_scalar <= 0:
                        continue
                    vids = np.asarray(vid_train.sample_videos(
                        ts, zz[:tcfg.batch_size], cfg))
                    _write_video_grid(vids, 8, os.path.join(
                        run_dir, f"{name}_{epoch:02d}_{step:06d}.mp4"))
            if _crossed(prev_step, step, tcfg.checkpoint_every):
                saver.save(ckpt_dir, step, ts._asdict(),
                           max_to_keep=tcfg.max_checkpoints_to_keep)
            if steps_limit and step >= steps_limit:
                break
        if chunk_fn is not None:
            flush_pending()  # epoch-tail partial chunk
        if steps_limit and step >= steps_limit:
            break
    saver.save(ckpt_dir, step, ts._asdict(),
               max_to_keep=tcfg.max_checkpoints_to_keep)
    saver.close()
    log.close()
    return ts


def _write_video_grid(videos: np.ndarray, cols: int, path: str,
                      fps: float = 25.0) -> None:
    """(B, T, s, s, c) [-1,1] -> tiled grid mp4 (dump_sample layout,
    z_model_lib.py:261-308)."""
    from gifgan_tpu.data.video import encode_mp4

    b, t, s, _, c = videos.shape
    cols = max(1, min(cols, b))
    rows = -(-b // cols)                   # ceil: never drop remainder videos
    u8 = denorm_u8(videos)
    if rows * cols > b:                    # pad with black tiles
        pad = np.zeros((rows * cols - b, t, s, s, c), np.uint8)
        u8 = np.concatenate([u8, pad], axis=0)
    grid = u8.reshape(rows, cols, t, s, s, c)
    grid = grid.transpose(2, 0, 3, 1, 4, 5).reshape(t, rows * s, cols * s, c)
    if c == 1:
        grid = np.repeat(grid, 3, axis=-1)
    encode_mp4(path, grid, fps=fps)


def train_recurrent(clips_iter: Callable[[], Iterator[np.ndarray]],
                    cfg: RecurrentImageConfig, tcfg: TrainConfig,
                    resume: bool = True, allow_overwrite: bool = False,
                    steps_limit: Optional[int] = None,
                    clips_u8: Optional[np.ndarray] = None):
    """clips_iter yields (B, T+1, s, s, c) float [0,1] batches. Refuses to
    reuse an existing checkpoint dir unless resuming (recurrent_DCGAN.py:130-134).

    clips_u8: device-resident fast path — an (N, T+1, s, s, c) uint8 corpus
    kept in HBM (data/device.py DeviceCorpus, out_range='unit' since this
    family trains on [0,1] frames); the host ships (B,) int32 ids per step.
    clips_iter is ignored."""
    from gifgan_tpu.train import recurrent as rtrain

    run_dir = tcfg.run_dir
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    existing = ckpt.latest_step(ckpt_dir)
    if existing is not None and not resume and not allow_overwrite:
        raise RuntimeError(
            f"checkpoint dir {ckpt_dir} exists (step {existing}); pass "
            "resume=True or allow_overwrite=True")
    os.makedirs(run_dir, exist_ok=True)
    save_config({"model": cfg, "train": tcfg},
                os.path.join(run_dir, "params.json"))
    rngs = PRNGSequence(tcfg.seed)
    ts = rtrain.init_train_state(rngs.next(), cfg, tcfg)
    if resume and existing is not None:
        ts = rtrain.RecurrentTrainState(**ckpt.restore(ckpt_dir,
                                                       ts._asdict()))
        print(f"resumed from step {int(ts.step)}")
        rngs = _resume_rngs(tcfg.seed, int(ts.step))

    corpus = None
    if clips_u8 is not None:
        if clips_u8.ndim != 5 or clips_u8.shape[1] != cfg.seq_length + 1:
            raise ValueError(
                f"clips_u8 must be (N, seq_length+1={cfg.seq_length + 1}, "
                f"s, s, c) uint8, got {clips_u8.shape}")
        from gifgan_tpu.data.device import DeviceCorpus

        corpus = DeviceCorpus(np.ascontiguousarray(clips_u8),
                              out_range="unit")
        if corpus.n < tcfg.batch_size:
            raise ValueError(f"clips_u8 has {corpus.n} clips "
                             f"< batch_size {tcfg.batch_size}")

    def _corpus_id_batches(epoch_seed: int) -> Iterator[np.ndarray]:
        perm = np.random.default_rng(epoch_seed).permutation(corpus.n)
        for i in range(corpus.n // tcfg.batch_size):
            yield perm[i * tcfg.batch_size:(i + 1) * tcfg.batch_size]

    log = MetricsLogger(run_dir)
    saver = ckpt.AsyncCheckpointer()
    step = int(jax.device_get(ts.step))
    start_step = step
    for epoch in range(tcfg.epochs):
        epoch_seed = tcfg.seed + start_step + epoch
        batches = (_corpus_id_batches(epoch_seed) if corpus is not None
                   else PrefetchLoader(_epoch_iter(clips_iter, epoch_seed)))
        for clips in batches:
            import jax.numpy as jnp

            if corpus is not None:  # (B,) ids -> (B, T+1, s, s, c) [0,1]
                clips = corpus.sample(np.asarray(clips))
            ts, metrics = rtrain.train_step(ts, jnp.asarray(clips),
                                            rngs.next(), cfg, tcfg)
            step += 1
            log.log(step, metrics)
            if tcfg.sample_every and step % tcfg.sample_every == 0:
                preds = np.asarray(rtrain.predict(ts, jnp.asarray(clips), cfg))
                _write_video_grid(preds * 2.0 - 1.0,
                                  min(4, preds.shape[0]),
                                  os.path.join(run_dir,
                                               f"pred_{step:06d}.mp4"))
            if tcfg.checkpoint_every and step % tcfg.checkpoint_every == 0:
                saver.save(ckpt_dir, step, ts._asdict(),
                           max_to_keep=tcfg.max_checkpoints_to_keep)
            if steps_limit and step >= steps_limit:
                break
        if steps_limit and step >= steps_limit:
            break
    saver.save(ckpt_dir, step, ts._asdict(),
               max_to_keep=tcfg.max_checkpoints_to_keep)
    saver.close()
    log.close()
    return ts
