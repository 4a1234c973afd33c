"""Batch GIF sampler + z-trajectory renderer.

Rebuilds the serving tools:
  - `gif_wall`: continuous batch sampling of the video GAN into numbered
    GIFs with atomic tmp+rename writes — the "endless GIF wall"
    (reference model_sampler.py:61-84).
  - `render_z_trajectory`: render a saved per-frame z trajectory (.npy) to
    an mp4 at an upscale factor (reference z_reader.py:52-72).

Inference is one jitted sampler reused across batches; encoding is
host-side and overlaps the next device batch (the device call is async).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

from gifgan_tpu.ops.image import denorm_u8


def gif_wall(sample_fn: Callable[[np.ndarray], np.ndarray],
             z_dim: int, out_dir: str, batch_size: int = 64,
             num_batches: Optional[int] = 1, fps: float = 8.0,
             seed: int = 0, start_index: int = 0,
             continuous: bool = False) -> int:
    """sample_fn: z (B, z_dim) -> videos (B, T, s, s, c) in [-1, 1].
    Writes `<n>.gif` per video. num_batches=None + continuous=True loops
    forever. Returns the number of GIFs written."""
    from gifgan_tpu.data.video import write_gif

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n = start_index
    batch = 0
    while continuous or batch < (num_batches or 0):
        z = rng.uniform(-1, 1, (batch_size, z_dim)).astype(np.float32)
        videos = np.asarray(sample_fn(z))
        u8 = denorm_u8(videos)
        for vid in u8:
            write_gif(os.path.join(out_dir, f"{n}.gif"), vid, fps=fps,
                      atomic=True)
            n += 1
        batch += 1
        # continuous=True ignores num_batches entirely (the reference's
        # endless GIF wall, model_sampler.py:63-84); stop only via signal.
    return n - start_index


def render_z_trajectory(sample_fn: Callable[[np.ndarray], np.ndarray],
                        z_path: str, out_path: str, scale: int = 2,
                        fps: float = 8.0) -> str:
    """z_path: .npy of (T, z_dim) — one latent per frame. Renders each
    through the image sampler and writes an upscaled mp4."""
    from gifgan_tpu.data.video import encode_mp4

    zs = np.load(z_path).astype(np.float32)
    imgs = np.asarray(sample_fn(zs))
    u8 = denorm_u8(imgs)
    if scale != 1:
        u8 = np.repeat(np.repeat(u8, scale, axis=1), scale, axis=2)
    encode_mp4(out_path, u8, fps=fps)
    return out_path
