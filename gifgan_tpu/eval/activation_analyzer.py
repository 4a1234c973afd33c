"""Discriminator-activation-space distance analysis.

Rebuild of discriminator_activation_analyzer.py (reference): measures whether
the image-D h2 activation space is a useful video metric by comparing
INTRA-video vs INTER-video pairwise L2 activation distances over frames
sampled from many videos (:111-165), skipping near-duplicate frames
(np.allclose, :119-124).

TPU-native: all frames batch through the discriminator once; the full
pairwise distance matrix is one |a|^2 + |b|^2 - 2ab Gram matmul on the MXU
instead of the reference's nested python loops.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def _pairwise_l2(flat: "jax.Array"):
    import jax.numpy as jnp

    sq = jnp.sum(flat * flat, axis=1)
    gram = flat @ flat.T
    d2 = sq[:, None] + sq[None, :] - 2.0 * gram
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def activation_distances(params, state, cfg,
                         videos: Sequence[np.ndarray],
                         frames_per_video: int = 4,
                         seed: int = 0,
                         dedup_atol: float = 1e-6) -> Dict:
    """videos: list of (T, s, s, c) float arrays in [-1, 1] at model
    resolution. Returns {"intra": [...], "inter": [...], "summary": {...}}.
    """
    import jax.numpy as jnp

    from gifgan_tpu.models import dcgan

    rng = np.random.default_rng(seed)
    frames, vid_ids = [], []
    for vid_id, vid in enumerate(videos):
        t = vid.shape[0]
        idxs = rng.choice(t, size=min(frames_per_video, t), replace=False)
        picked = []
        for i in sorted(idxs):
            f = np.asarray(vid[i])
            # skip near-duplicate frames within a video (:119-124)
            if any(np.allclose(f, p, atol=dedup_atol) for p in picked):
                continue
            picked.append(f)
        frames.extend(picked)
        vid_ids.extend([vid_id] * len(picked))

    batch = jnp.asarray(np.stack(frames), jnp.float32)
    _, acts, _ = dcgan.discriminator(params.discriminator,
                                     state.discriminator, batch, cfg,
                                     train=False)
    flat = acts.reshape(acts.shape[0], -1)
    dist = np.asarray(_pairwise_l2(flat))

    ids = np.asarray(vid_ids)
    same = ids[:, None] == ids[None, :]
    upper = np.triu(np.ones_like(same, dtype=bool), k=1)
    intra = dist[same & upper]
    inter = dist[~same & upper]
    return {
        "intra": intra,
        "inter": inter,
        "summary": {
            "intra_mean": float(intra.mean()) if intra.size else None,
            "inter_mean": float(inter.mean()) if inter.size else None,
            "separation": (float(inter.mean() / intra.mean())
                           if intra.size and inter.size and intra.mean() > 0
                           else None),
            "n_frames": int(len(frames)),
        },
    }


def write_distance_lists(result: Dict, out_prefix: str) -> None:
    """Text dumps for offline histogramming (:168-173)."""
    for kind in ("intra", "inter"):
        with open(f"{out_prefix}_{kind}.txt", "w") as f:
            for v in result[kind]:
                f.write(f"{v}\n")
