"""Synthetic face-clip generator for tests and benchmarks.

The reference has no test data strategy at all (SURVEY.md §4); we need
deterministic, dependency-free clips shaped exactly like the real pipeline's
output (fixed-length 64x64x16 face crops, z_model_lib.py:332-351) to drive
unit/integration tests and the bench without the Giphy corpus.

Produces "face-like" moving blobs: an ellipse head + two eyes + mouth whose
position/scale jitter smoothly over time — enough structure for face-y
statistics without any real data.
"""

from __future__ import annotations

import numpy as np


def synthetic_clip(seed: int, length: int = 16, size: int = 64,
                   channels: int = 3) -> np.ndarray:
    """One clip (length, size, size, channels) uint8."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size

    cx0, cy0 = rng.uniform(0.35, 0.65, 2)
    scale0 = rng.uniform(0.28, 0.38)
    drift = rng.uniform(-0.004, 0.004, 2)
    wobble_phase = rng.uniform(0, 2 * np.pi, 3)
    skin = rng.uniform(0.55, 0.9, channels)
    bg = rng.uniform(0.05, 0.3, channels)

    frames = np.empty((length, size, size, channels), np.uint8)
    for t in range(length):
        cx = cx0 + drift[0] * t + 0.01 * np.sin(0.7 * t + wobble_phase[0])
        cy = cy0 + drift[1] * t + 0.01 * np.cos(0.5 * t + wobble_phase[1])
        s = scale0 * (1.0 + 0.05 * np.sin(0.4 * t + wobble_phase[2]))

        d2 = ((xx - cx) / s) ** 2 + ((yy - cy) / (1.25 * s)) ** 2
        head = np.clip(1.2 - d2, 0, 1)

        img = np.empty((size, size, channels), np.float32)
        for c in range(channels):
            img[..., c] = bg[c] + (skin[c] - bg[c]) * np.minimum(head, 1.0)

        # eyes
        mouth_open = 0.5 + 0.5 * np.sin(0.9 * t + wobble_phase[0])
        for ex in (-0.35, 0.35):
            e2 = (((xx - (cx + ex * s)) / (0.15 * s)) ** 2 +
                  ((yy - (cy - 0.25 * s)) / (0.12 * s)) ** 2)
            img[e2 < 1.0] *= 0.2
        # mouth (opens/closes over time)
        m2 = (((xx - cx) / (0.4 * s)) ** 2 +
              ((yy - (cy + 0.45 * s)) / (0.1 * s * (0.3 + mouth_open))) ** 2)
        img[m2 < 1.0] *= 0.35

        frames[t] = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    return frames


def synthetic_clips(n: int, length: int = 16, size: int = 64,
                    channels: int = 3, seed: int = 0) -> np.ndarray:
    """(n, length, size, size, channels) uint8, deterministic in seed."""
    return np.stack([synthetic_clip(seed * 100003 + i, length, size, channels)
                     for i in range(n)])


def synthetic_stills(n: int, size: int = 64, channels: int = 3,
                     seed: int = 0) -> np.ndarray:
    """Single frames sampled from synthetic clips — the analog of the
    sample_frames still-image training set (reference sample_frames.py:39-57)."""
    rng = np.random.default_rng(seed)
    out = np.empty((n, size, size, channels), np.uint8)
    for i in range(n):
        clip = synthetic_clip(seed * 7919 + i, length=4, size=size,
                              channels=channels)
        out[i] = clip[rng.integers(0, clip.shape[0])]
    return out
