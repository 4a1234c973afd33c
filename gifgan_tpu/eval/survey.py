"""Human-survey sample export.

Rebuild of the reference's MTurk evaluation pipeline (firebase/public/mturk/:
three 250-GIF sample sets — "rnn" recurrent_image, "nested" recurrent_z, and
a "stride" control built by cutting sample-grid images into fake videos,
models/recurrent_z/image_stitch.py:29-44). Produces the same artifact layout
as a static directory tree ready for any hosting (firebase or otherwise),
plus a manifest.json the survey frontend can load.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import numpy as np


def export_survey_samples(sample_fns: Dict[str, Callable[[int], np.ndarray]],
                          out_dir: str, samples_per_variant: int = 250,
                          fps: float = 8.0, seed: int = 0) -> Dict:
    """sample_fns: variant name -> fn(n) returning (n, T, H, W, C) uint8
    videos. Writes out_dir/<variant>_samples/<i>.gif + manifest.json."""
    from gifgan_tpu.data.video import write_gif

    os.makedirs(out_dir, exist_ok=True)
    manifest = {"variants": {}, "samples_per_variant": samples_per_variant}
    for variant, fn in sorted(sample_fns.items()):
        vdir = os.path.join(out_dir, f"{variant}_samples")
        os.makedirs(vdir, exist_ok=True)
        clips = np.asarray(fn(samples_per_variant))
        files = []
        for i, clip in enumerate(clips):
            name = f"{i}.gif"
            write_gif(os.path.join(vdir, name), clip, fps=fps)
            files.append(f"{variant}_samples/{name}")
        manifest["variants"][variant] = files
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def stride_control_videos(grid_images: np.ndarray, tile: int,
                          frames_per_video: int, num_videos: int,
                          seed: int = 0) -> np.ndarray:
    """The "stride" control set: cut sample-grid pngs into random tiles and
    string them into fake videos (reference image_stitch.py:29-44) — a
    temporal-incoherence baseline for the survey."""
    rng = np.random.default_rng(seed)
    n, gh, gw = grid_images.shape[:3]
    rows, cols = gh // tile, gw // tile
    out = np.empty((num_videos, frames_per_video, tile, tile,
                    grid_images.shape[-1]), grid_images.dtype)
    for v in range(num_videos):
        for t in range(frames_per_video):
            g = rng.integers(0, n)
            r = rng.integers(0, rows)
            c = rng.integers(0, cols)
            out[v, t] = grid_images[g, r * tile:(r + 1) * tile,
                                    c * tile:(c + 1) * tile]
    return out
