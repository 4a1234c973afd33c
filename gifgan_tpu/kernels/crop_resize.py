"""Batched crop + bilinear resize for arbitrary boxes — shape-static.

The track pipeline's crop stage (reference: per-frame cv2 crop + resize,
track_faces.py:593-641) must handle boxes whose sizes differ per detection.
Naive device code recompiles per crop shape; this formulation is fully
shape-static regardless of box sizes: for each output pixel, compute its
source coordinate inside the (normalized) box and gather 4 neighbors — one
vectorized program for ANY number of crops of ANY box sizes.

Sampling convention matches cv2.INTER_LINEAR / kernels.resize.interp_matrix:
half-pixel centers, src = (dst + 0.5) * box/out - 0.5, edge-clamped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("target",))
def crop_resize_bilinear(frames: jax.Array, frame_idx: jax.Array,
                         boxes: jax.Array, target: int) -> jax.Array:
    """frames (T, H, W, C) any float/uint dtype; frame_idx (N,) int;
    boxes (N, 4) [y1, x1, y2, x2] INCLUSIVE pixel bounds (the reference crops
    rows y1..y2 inclusive, track_faces.py:1038). Returns (N, target, target,
    C) float32."""
    x = frames.astype(jnp.float32)
    t, h, w, c = x.shape
    n = boxes.shape[0]
    boxes = boxes.astype(jnp.float32)
    bh = boxes[:, 2] - boxes[:, 0] + 1.0
    bw = boxes[:, 3] - boxes[:, 1] + 1.0

    d = (jnp.arange(target, dtype=jnp.float32) + 0.5) / target  # (target,)
    src_y = boxes[:, 0, None] + d[None, :] * bh[:, None] - 0.5  # (N, t)
    src_x = boxes[:, 1, None] + d[None, :] * bw[:, None] - 0.5

    y0 = jnp.clip(jnp.floor(src_y), 0, h - 1)
    x0 = jnp.clip(jnp.floor(src_x), 0, w - 1)
    fy = jnp.clip(src_y - y0, 0.0, 1.0)
    fx = jnp.clip(src_x - x0, 0.0, 1.0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)

    fi = frame_idx.astype(jnp.int32)[:, None, None]            # (N,1,1)

    def gather(yi, xi):
        # (N, t, t, C) gather
        return x[fi, yi[:, :, None], xi[:, None, :], :]

    g00 = gather(y0i, x0i)
    g01 = gather(y0i, x1i)
    g10 = gather(y1i, x0i)
    g11 = gather(y1i, x1i)
    fy_ = fy[:, :, None, None]
    fx_ = fx[:, None, :, None]
    top = g00 * (1 - fx_) + g01 * fx_
    bot = g10 * (1 - fx_) + g11 * fx_
    return top * (1 - fy_) + bot * fy_
