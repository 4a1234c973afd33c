"""Per-dimension z-sweep sampling grids — the reference's `visualize` modes.

Behavioral rebuild of utils.py:149-202 (reference), functional instead of
session-driven: `sample_fn(z) -> (B, s, s, c) float [-1, 1]`.

Modes (matching the reference option numbers):
  0: one random-z batch -> 8x8 grid png
  1: for each latent dim, sweep 0..1 across the batch with all other dims
     zero -> one grid png per dim
  2: random base z ~ U[-0.2, 0.2] tiled over the batch, sweep randomly
     chosen dims -> one GIF per dim
  3: like 1 but rendered as a GIF per dim
  4: like 1, plus a merged "bounce" GIF of 10x10 grids animating over the
     batch (sweep) index forward then backward
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional

import numpy as np

from gifgan_tpu.ops.image import denorm_u8, inverse_transform, merge_grid


def _grid_png(samples: np.ndarray, path: str, rows: int = 8, cols: int = 8):
    import imageio.v2 as imageio

    u8 = denorm_u8(samples[None])[0]
    b = u8.shape[0]
    cols = min(cols, b)
    rows = min(rows, -(-b // cols))
    grid = np.asarray(merge_grid(
        inverse_transform(np.asarray(samples[:rows * cols])), rows, cols))
    imageio.imwrite(path, (np.clip(grid, 0, 1) * 255).astype(np.uint8))


def _gif(frames: np.ndarray, path: str, fps: float = 8.0):
    from gifgan_tpu.data.video import write_gif

    write_gif(path, denorm_u8(frames[None])[0]
              if frames.ndim == 4 else frames, fps=fps)


def _sweep_z(batch_size: int, z_dim: int, idx: int,
             base: Optional[np.ndarray] = None) -> np.ndarray:
    values = np.arange(0, 1, 1.0 / batch_size)
    z = np.zeros((batch_size, z_dim), np.float32) if base is None \
        else np.tile(base, (batch_size, 1)).astype(np.float32)
    z[:, idx] = values
    return z


def visualize(sample_fn: Callable, z_dim: int, batch_size: int, option: int,
              out_dir: str, num_dims: Optional[int] = None,
              seed: int = 0) -> List[str]:
    """Run one reference visualize mode; returns the written paths."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    num_dims = num_dims if num_dims is not None else min(100, z_dim)
    written = []

    if option == 0:
        z = rng.uniform(-1, 1, (batch_size, z_dim)).astype(np.float32)
        p = os.path.join(out_dir, "test_random.png")
        _grid_png(np.asarray(sample_fn(z)), p)
        written.append(p)
        return written

    if option == 2:
        dims = rng.integers(0, z_dim, size=num_dims)
        base = rng.uniform(-0.2, 0.2, size=z_dim)
    else:
        dims = np.arange(num_dims)
        base = None

    image_set = []
    for idx in dims:
        z = _sweep_z(batch_size, z_dim, int(idx), base)
        samples = np.asarray(sample_fn(z))
        if option == 1:
            p = os.path.join(out_dir, f"test_arange_{idx}.png")
            _grid_png(samples, p)
        else:
            p = os.path.join(out_dir, f"test_gif_{idx}.gif")
            _gif(samples, p)
            if option == 4:
                image_set.append(samples)
        written.append(p)

    if option == 4 and image_set:
        # bounce over the sweep index: frame k = 10x10 grid of (dim, k)
        k_max = min(batch_size, image_set[0].shape[0])
        order = list(range(k_max)) + list(range(k_max - 1, -1, -1))
        grids = []
        side = int(np.ceil(np.sqrt(len(image_set))))
        for k in order:
            stack = np.stack([s[k] for s in image_set])
            grids.append(np.asarray(merge_grid(
                inverse_transform(stack), side, side)))
        p = os.path.join(out_dir, "test_gif_merged.gif")
        from gifgan_tpu.data.video import write_gif

        write_gif(p, (np.clip(np.stack(grids), 0, 1) * 255).astype(np.uint8),
                  fps=8)
        written.append(p)
    return written
