"""Face-track preprocessing pipeline: detect -> associate -> filter ->
interpolate -> expand -> stabilize -> crop.

Orchestration rebuild of the reference driver (track_faces.py:175-238 process,
:1060-1104 main loop) with its operational behaviors: per-file error isolation
with a consecutive-error abort threshold (:1088-1100), params persisted to the
output dir (:1073-1074), the live dashboard rewritten periodically (:1102-1104),
and idempotent resume (skip files whose outputs exist — the z_space_finder
resume pattern, z_space_finder.py:310-314, applied here too).

TPU-native split: the reference decodes each video 3-4x and does everything
frame-by-frame on host (SURVEY.md §3.4). Here the video is decoded ONCE into
a frame array; detection/flow run on host (branchy OpenCV work), while the
crop+resize of all track frames happens as one batched on-device op
(gifgan_tpu.kernels.resize) instead of per-frame cv2.resize calls.
"""

from __future__ import annotations

import dataclasses
import os
import time
import traceback
import threading
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from gifgan_tpu.core.config import TrackConfig
from gifgan_tpu.track import boxes as B
from gifgan_tpu.track import stabilize as S
from gifgan_tpu.track.stats import TrackStats

try:
    import cv2
    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False


def crop_and_resize_tracks(frames: np.ndarray, tracks: List[B.Track],
                           target: int) -> List[np.ndarray]:
    """Crop every detection's box and resize to (target, target): ALL crops
    of ALL tracks in one shape-static device program, regardless of per-box
    sizes (kernels.crop_resize) — replacing the reference's per-frame
    cv2.resize loop (track_faces.py:593-641 + get_crop :1037)."""
    import jax.numpy as jnp

    from gifgan_tpu.kernels.crop_resize import crop_resize_bilinear

    if not tracks:
        return []
    all_boxes, all_fidx, lengths = [], [], []
    for track in tracks:
        for d in track:
            all_boxes.append((d.y1, d.x1, d.y2, d.x2))
            all_fidx.append(d.frame_number)
        lengths.append(len(track))
    crops = crop_resize_bilinear(
        jnp.asarray(frames), jnp.asarray(all_fidx, jnp.int32),
        jnp.asarray(all_boxes, jnp.float32), target)
    crops = np.clip(np.asarray(crops), 0, 255).astype(np.uint8)
    out, pos = [], 0
    for ln in lengths:
        out.append(crops[pos:pos + ln])
        pos += ln
    return out


def process_video(frames: np.ndarray, detector: Callable,
                  cfg: TrackConfig, stats: Optional[TrackStats] = None,
                  per_frame: Optional[List[list]] = None,
                  ) -> List[np.ndarray]:
    """frames: (T, H, W, C) uint8 RGB. Returns a list of stabilized face
    clips (each (t, target, target, C) uint8).

    per_frame: precomputed per-frame Detection lists — skips stage 1.
    run_directory's detect_batch_clips mode computes detections for N
    clips in one device dispatch (DeviceHaarDetector.detect_clips) and
    feeds them through here."""
    stats = stats if stats is not None else TrackStats()
    t, height, width = frames.shape[:3]
    frame_size = (width, height)

    # 1. detection — whole-clip batched when the detector supports it
    # (BatchedJaxHaarDetector.detect_video), else per frame
    if per_frame is None:
        if hasattr(detector, "detect_video"):
            per_frame = detector.detect_video(frames)
        else:
            per_frame = [detector(frames[i], i) for i in range(t)]
    for dets in per_frame:
        stats.cnt_total_detections += len(dets)

    # 2-3. association + validity filtering
    tracks = B.associate_detections(per_frame, cfg.min_jaccard, cfg.max_skip,
                                    stats=stats)
    stats.cnt_initial_tracks += len(tracks)
    for tr in tracks:
        stats.observe_track(len(tr), [d.height for d in tr],
                            [d.width for d in tr])
    tracks, _ = B.discard_invalid_tracks(
        tracks, cfg.min_frame_count, cfg.min_total_detections, stats=stats)

    # 4-5. interpolation + aspect expansion
    tracks = B.interpolate_missing_frames(tracks)
    tracks, _ = B.expand_bounding_boxes(
        tracks, frame_size, cfg.target_size, cfg.target_size, stats=stats)

    # 6. stabilization over grayscale frames
    gray = (np.dot(frames[..., :3].astype(np.float32),
                   [0.299, 0.587, 0.114]).astype(np.uint8)
            if frames.shape[-1] == 3 else frames[..., 0])
    choice = getattr(cfg, "flow_backend", "auto")
    if choice == "mxu" or (choice == "auto" and not _HAVE_CV2):
        # gather-free device kernels (kernels/flow.py): one-hot-matmul
        # window sampling, one dispatch per pair, per-bucket compiles
        from gifgan_tpu.kernels.flow import mxu_flow_backend

        flow_backend = lambda a, b: mxu_flow_backend(
            a, b, cfg.max_corners, cfg.corner_quality,
            cfg.corner_min_distance, win_size=cfg.lk_window,
            max_level=cfg.lk_levels)
    elif choice == "jax":  # pure-JAX gather formulation (track/flow_jax.py)
        from gifgan_tpu.track.flow_jax import jax_flow_backend

        flow_backend = lambda a, b: jax_flow_backend(
            a, b, cfg.max_corners, cfg.corner_quality,
            cfg.corner_min_distance, win_size=cfg.lk_window,
            max_level=cfg.lk_levels)
    else:
        flow_backend = lambda a, b: S.cv2_flow_backend(
            a, b, cfg.max_corners, cfg.corner_quality,
            cfg.corner_min_distance, win_size=cfg.lk_window,
            max_level=cfg.lk_levels)
    stable = S.stabilize_tracks(
        list(gray), tracks, frame_size, cfg.min_frame_count,
        target_aspect=1.0, flow_backend=flow_backend, stats=stats)
    stable = [s for s in stable if s is not None]

    stats.cnt_detections_kept += sum(
        1 for tr in stable for d in tr if not d.interpolated)
    stats.cnt_detections_written += sum(len(tr) for tr in stable)
    stats.observe_final(len(stable), [len(tr) for tr in stable])

    # 7. crop + batched device resize
    return crop_and_resize_tracks(frames, stable, cfg.target_size)


def run_directory(input_dir: str, output_dir: str, cfg: TrackConfig,
                  detector: Callable = None,
                  cascade_path: str = None,
                  decode_fn: Callable = None,
                  max_consecutive_errors: int = 10,
                  dashboard_every_s: float = 15.0,
                  resume: bool = True,
                  workers: int = 1,
                  detect_batch_clips: int = 1) -> TrackStats:
    """Process every video in a directory with error isolation, dashboard
    refresh, params persistence, and idempotent resume.

    workers > 1 runs files concurrently on a thread pool (decode and the
    native Haar evaluator release the GIL in their C++ loops); per-file
    stats are accumulated locally and merged under a lock, so the combined
    output equals a sequential run up to file ordering — the in-process
    version of the reference's shard-by-hand + stat_combination.py scale-out
    story (SURVEY.md §2.2).

    detect_batch_clips > 1 (device detector backend): decode that many
    files per group and run ONE detection dispatch for the whole group
    (DeviceHaarDetector.detect_clips — letterbox-packed canvas), then the
    host stages per file. Amortizes the fixed ~200 ms/dispatch device
    costs: measured 1.80x the native C++ detector on the realistic 128px
    mturk distribution at batch 8 (BASELINE.md, 2026-08-19) where the
    per-clip device path only reached 1.3x. Composes with workers > 1
    (round 5): the device program stays one serialized resource, owned by
    a single dispatcher thread, while the workers decode ahead of it and
    track behind it."""
    from gifgan_tpu.track import detect as D

    os.makedirs(output_dir, exist_ok=True)
    if decode_fn is None:
        def decode_fn(path):
            if not _HAVE_CV2:
                raise RuntimeError("cv2 unavailable")
            cap = cv2.VideoCapture(path)
            frames = []
            while cap.isOpened() and len(frames) < cfg.max_frames:
                ret, im = cap.read()
                if not ret:
                    break
                frames.append(cv2.cvtColor(im, cv2.COLOR_BGR2RGB))
            cap.release()
            return np.stack(frames) if frames else None

    stats = TrackStats()
    params = dataclasses.asdict(cfg)
    files = sorted(f for f in os.listdir(input_dir)
                   if f.endswith((".mp4", ".avi", ".gif")))
    stats.total_files = len(files)

    todo = []
    for name in files:
        base = os.path.splitext(name)[0]
        if resume and any(f.startswith(base + "_crop")
                          for f in os.listdir(output_dir)):
            stats.cnt_files_processed += 1
        else:
            todo.append(name)

    # backend auto-selection from the measured crossover (detect.py): probe
    # the first decodable source's frame size, then pick device+batched vs
    # native per-source — the BASELINE.md numbers as the default instead of
    # operator knowledge. Explicit backends and injected detectors bypass it.
    backend = getattr(cfg, "detector_backend", "auto")
    auto_selected = False
    probed_frames = {}  # probe's decode, reused below (round-4 advisor:
    # the first clip of every run was decoded twice — once for its shape,
    # once again by process_one)
    if detector is None and backend == "auto" and cascade_path and todo:
        min_px = None
        for name in todo[:5]:  # a few tries; probe failure -> host default
            try:
                frames = decode_fn(os.path.join(input_dir, name))
                if frames is not None and frames.ndim >= 3:
                    min_px = int(min(frames.shape[1], frames.shape[2]))
                    probed_frames[name] = frames
                    break
            except Exception:
                continue
        backend, detect_batch_clips = D.select_detector_backend(
            min_px, tpu_available=D._tpu_available(), workers=workers,
            detect_batch_clips=detect_batch_clips)
        auto_selected = True
        params["detector_backend_selected"] = backend
        params["detect_batch_clips_selected"] = detect_batch_clips
        if backend == "native":
            backend = "auto"  # default_detector's fallback order, native 1st
    if detector is None:
        try:
            detector = D.default_detector(
                cascade_path=cascade_path, scale_factor=cfg.scale_factor,
                min_neighbors=cfg.min_neighbors, backend=backend)
        except (RuntimeError, ValueError):
            if not auto_selected:
                raise  # explicit backend choices fail loudly, never degrade
            # auto-selected backend unavailable after all (e.g. the device
            # detector's setup failing despite jax claiming a TPU): degrade
            # to the fallback order rather than dying on a default
            detector = D.default_detector(
                cascade_path=cascade_path, scale_factor=cfg.scale_factor,
                min_neighbors=cfg.min_neighbors, backend="auto")
            detect_batch_clips = 1

    def process_one(name, frames=None, per_frame=None, base_seconds=0.0):
        """Decode + track + write one file with a local stats object.
        Returns (local_stats, ok, seconds). frames/per_frame: pre-decoded
        pixels and precomputed detections from the batched-detect path
        (base_seconds carries that file's share of the group dispatch so
        the dashboard's per-file histogram stays meaningful)."""
        local = TrackStats()
        base = os.path.splitext(name)[0]
        t0 = time.time() - base_seconds
        try:
            if frames is None:
                frames = decode_fn(os.path.join(input_dir, name))
            if frames is None:
                raise RuntimeError("decode failed")
            clips = process_video(frames, detector, cfg, local,
                                  per_frame=per_frame)
            from gifgan_tpu.data.video import encode_mp4

            for i, clip in enumerate(clips):
                encode_mp4(os.path.join(output_dir,
                                        f"{base}_crop_{i}.mp4"), clip)
            local.cnt_files_processed += 1
            return local, True, time.time() - t0
        except Exception:
            local.cnt_files_errored += 1
            traceback.print_exc()
            return local, False, time.time() - t0

    lock = threading.Lock()
    consecutive_errors = 0
    last_dash = 0.0
    abort = False

    def consume(result):
        nonlocal consecutive_errors, last_dash, abort
        local, ok, seconds = result
        with lock:
            stats.update(local)
            stats.observe_file_time(seconds)
            consecutive_errors = 0 if ok else consecutive_errors + 1
            if consecutive_errors >= max_consecutive_errors:
                print(f"aborting: {consecutive_errors} consecutive errors")
                abort = True
            if time.time() - last_dash > dashboard_every_s:
                stats.write(output_dir, params)
                last_dash = time.time()

    def _to_gray(f):
        return (np.dot(f[..., :3].astype(np.float64), [0.299, 0.587, 0.114])
                if f.ndim == 4 and f.shape[-1] >= 3
                else np.asarray(f, np.float64)[..., 0]
                if f.ndim == 4 else np.asarray(f, np.float64))

    if detect_batch_clips > 1 and hasattr(detector, "detect_clips") \
            and workers > 1:
        # Composed dispatcher (round-4 verdict item 5): the device cascade
        # is ONE serialized program, but decode and tracking are host work
        # that threads fine (both release the GIL in their C++ loops). N
        # workers decode ahead and track behind; this thread alone owns the
        # device detector and letterbox-batches decoded clips across
        # sources (detect_clips already batches within a call). Agreement
        # with the serial batched path is pinned in tests/test_track.py;
        # throughput evidence is bounded by this host's single core (the
        # design exists for multi-core TPU hosts).
        from concurrent.futures import ThreadPoolExecutor

        from gifgan_tpu.track.boxes import Detection

        def decode_one(name):
            frames = probed_frames.pop(name, None)
            if frames is None:
                frames = decode_fn(os.path.join(input_dir, name))
            if frames is None:
                raise RuntimeError("decode failed")
            return name, frames

        window = max(2 * workers, detect_batch_clips)
        with ThreadPoolExecutor(max_workers=workers) as dec_pool, \
                ThreadPoolExecutor(max_workers=workers) as trk_pool:
            it = iter(todo)
            dec_pending = []        # decode futures, in submission order
            trk_pending = []        # tracking futures, in submission order

            def top_up():
                while len(dec_pending) < window:
                    name = next(it, None)
                    if name is None:
                        return
                    dec_pending.append(dec_pool.submit(decode_one, name))

            top_up()
            while dec_pending and not abort:
                group = []          # decode failures stay per-file isolated
                while dec_pending and len(group) < detect_batch_clips \
                        and not abort:
                    fut = dec_pending.pop(0)
                    try:
                        group.append(fut.result())
                    except Exception:
                        local = TrackStats()
                        local.cnt_files_errored += 1
                        traceback.print_exc()
                        consume((local, False, 0.0))
                    top_up()
                if not group:
                    continue
                grays = [_to_gray(f) for _, f in group]
                t0 = time.time()
                try:
                    group_rects = detector.detect_clips(grays)
                except Exception:
                    # batched dispatch failed (e.g. canvas over the
                    # integral-image precision bound): per-clip fallback
                    # inside process_one — same results, no amortization
                    traceback.print_exc()
                    group_rects = [None] * len(group)
                share = (time.time() - t0) / len(group)
                for (name, frames), clip_rects in zip(group, group_rects):
                    pf = None if clip_rects is None else [
                        [Detection.from_rect(r, fi) for r in fr]
                        for fi, fr in enumerate(clip_rects)]
                    trk_pending.append(trk_pool.submit(
                        process_one, name, frames=frames, per_frame=pf,
                        base_seconds=share))
                # harvest finished tracking without stalling the dispatcher
                while trk_pending and not abort and (
                        trk_pending[0].done()
                        or len(trk_pending) > 2 * workers):
                    consume(trk_pending.pop(0).result())
            while trk_pending and not abort:
                consume(trk_pending.pop(0).result())
            # on abort the in-flight files still finish (pool shutdown
            # waits) — fold their stats so they agree with output_dir
            aborted = abort
            for fut in trk_pending:
                local, ok, seconds = fut.result()
                with lock:
                    stats.update(local)
                    stats.observe_file_time(seconds)
            abort = aborted
    elif detect_batch_clips > 1 and hasattr(detector, "detect_clips"):
        from gifgan_tpu.track.boxes import Detection

        i = 0
        while i < len(todo) and not abort:
            group = todo[i:i + detect_batch_clips]
            i += len(group)
            decoded = []  # decode failures stay per-file isolated
            for name in group:
                try:
                    frames = probed_frames.pop(name, None)
                    if frames is None:
                        frames = decode_fn(os.path.join(input_dir, name))
                    if frames is None:
                        raise RuntimeError("decode failed")
                    decoded.append((name, frames))
                except Exception:
                    local = TrackStats()
                    local.cnt_files_errored += 1
                    traceback.print_exc()
                    consume((local, False, 0.0))
                    if abort:
                        break
            if abort or not decoded:
                continue
            grays = [_to_gray(f) for _, f in decoded]
            t0 = time.time()
            try:
                group_rects = detector.detect_clips(grays)
            except Exception:
                # batched dispatch failed (e.g. canvas over the integral-
                # image precision bound): fall back to per-clip detection
                # inside process_one — same results, no amortization
                traceback.print_exc()
                group_rects = [None] * len(decoded)
            share = (time.time() - t0) / len(decoded)
            for (name, frames), clip_rects in zip(decoded, group_rects):
                pf = None if clip_rects is None else [
                    [Detection.from_rect(r, fi) for r in fr]
                    for fi, fr in enumerate(clip_rects)]
                consume(process_one(name, frames=frames, per_frame=pf,
                                    base_seconds=share))
                if abort:
                    break
    elif workers <= 1:
        for name in todo:
            consume(process_one(name, frames=probed_frames.pop(name, None)))
            if abort:
                break
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            pending = []
            it = iter(todo)
            for name in it:
                pending.append(pool.submit(
                    process_one, name,
                    frames=probed_frames.pop(name, None)))
                if len(pending) >= 2 * workers:
                    consume(pending.pop(0).result())
                    if abort:
                        break
            while pending and not abort:
                consume(pending.pop(0).result())
            # on abort the in-flight files still finish (the pool shutdown
            # waits for them and their crops land on disk) — fold their
            # stats in too so stats agree with output_dir contents
            aborted = abort
            for fut in pending:
                local, ok, seconds = fut.result()
                with lock:
                    stats.update(local)
                    stats.observe_file_time(seconds)
            abort = aborted

    stats.write(output_dir, params)
    return stats
