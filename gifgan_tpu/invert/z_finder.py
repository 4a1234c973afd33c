"""Batch dataset z-extraction: videos -> per-video latent trajectories.

Rebuild of z_space_finder.py (reference), the production version of the
iterative video inverter: map a whole clip dataset to per-video z-trajectory
.npy files usable as latent paths. Operational behaviors kept:

  - idempotent resume: clips whose output .npy exists are skipped
    (z_space_finder.py:310-314)
  - partial batches padded to the compiled batch size (:105-109)
  - `stop_after` debug cutoff (:21)
  - per-frame schedule: `num_initial_steps` Adam steps on frame 0, then
    `num_steps_per_frame` warm-started steps per subsequent frame (:138-158)
  - optional comparison renders (reconstruction vs target per video)

TPU-native: each frame-level optimization is a jitted lax.scan chunk over the
whole batch of videos at once (the reference also batches; here the entire
multi-step loop is one XLA program per frame).
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

import numpy as np

from gifgan_tpu.core.config import DCGANConfig, InvertConfig
from gifgan_tpu.invert.optimize import invert_video_iterative


def extract_z_trajectories(params, state, cfg: DCGANConfig,
                           icfg: InvertConfig,
                           clip_paths: Sequence[str],
                           load_clip: Callable[[str], Optional[np.ndarray]],
                           output_dir: str,
                           batch_size: int = 8,
                           num_initial_steps: int = 500,
                           num_steps_per_frame: int = 100,
                           post_initial_lr_decay: float = 0.9,
                           stop_after: Optional[int] = None,
                           write_comparisons: bool = False,
                           seed: int = 0, mesh=None) -> List[str]:
    """load_clip: path -> (T, s, s, c) float [-1,1] frames or None to skip.
    Writes `<output_dir>/<clip-stem>.npy` of shape (T, z_dim). Returns the
    list of outputs written this run.

    mesh: optional jax.sharding.Mesh — each batch's per-frame optimizations
    run data-parallel over the mesh `data` axis (the partial-batch padding
    above already guarantees a constant batch_size, so pick batch_size a
    multiple of the mesh data axis)."""
    os.makedirs(output_dir, exist_ok=True)
    written: List[str] = []
    pending: List[tuple] = []
    processed = 0

    def out_path(p):
        return os.path.join(output_dir,
                            os.path.splitext(os.path.basename(p))[0] + ".npy")

    def flush(batch):
        nonlocal written
        if not batch:
            return
        clips = [c for _, c in batch]
        real = len(clips)
        while len(clips) < batch_size:        # pad partial batch (:105-109)
            clips.append(clips[-1])
        videos = np.stack(clips)               # (V, T, s, s, c)
        zs = invert_video_iterative(
            params, state, videos, cfg, icfg,
            num_initial_steps=num_initial_steps,
            num_steps_per_frame=num_steps_per_frame,
            post_initial_lr_decay=post_initial_lr_decay,
            key=__import__("jax").random.PRNGKey(seed),
            mesh=mesh)                                    # (T, V, z_dim)
        for i, (path, clip) in enumerate(batch[:real]):
            traj = zs[:, i, :]
            np.save(out_path(path), traj)
            written.append(out_path(path))
            if write_comparisons:
                _write_comparison(params, state, cfg, traj, clip,
                                  out_path(path)[:-4] + "_comparison.mp4")

    for path in clip_paths:
        if stop_after is not None and processed >= stop_after:
            break
        if os.path.exists(out_path(path)):     # resume (:310-314)
            continue
        clip = load_clip(path)
        if clip is None:
            print(f"skipping undecodable/short clip {path}")
            continue
        if pending and clip.shape != pending[0][1].shape:
            print(f"skipping {path}: shape {clip.shape} != batch shape "
                  f"{pending[0][1].shape}")
            continue
        pending.append((path, clip))
        processed += 1
        if len(pending) == batch_size:
            flush(pending)
            pending = []
    flush(pending)
    return written


def _write_comparison(params, state, cfg, traj: np.ndarray,
                      clip: np.ndarray, out_path: str) -> None:
    from gifgan_tpu.data.video import encode_mp4
    from gifgan_tpu.models import dcgan

    recon = np.asarray(dcgan.sample(params, state, traj, cfg))
    side = np.concatenate([clip, recon], axis=2)  # target | reconstruction
    from gifgan_tpu.ops.image import denorm_u8

    u8 = denorm_u8(side)
    encode_mp4(out_path, u8)
