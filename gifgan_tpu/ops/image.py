"""Image transforms (reference: models/recurrent_z/utils.py:17-65).

Pure-JAX versions; the fused Pallas resize+normalize kernel lives in
gifgan_tpu.kernels.resize and is validated against `resize_bilinear` here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def transform(x: Array) -> Array:
    """uint8/float [0,255] -> [-1, 1] (utils.py:57-63)."""
    return x.astype(jnp.float32) / 127.5 - 1.0


def inverse_transform(x: Array) -> Array:
    """[-1, 1] -> [0, 1] (utils.py:65)."""
    return (x + 1.0) / 2.0


def center_crop(x: Array, crop_h: int, crop_w: int | None = None) -> Array:
    """Center crop HxW(xC) (utils.py:47-55)."""
    crop_w = crop_w or crop_h
    h, w = x.shape[0], x.shape[1]
    j = int(round((h - crop_h) / 2.0))
    i = int(round((w - crop_w) / 2.0))
    return x[j:j + crop_h, i:i + crop_w]


def resize_bilinear(x: Array, out_h: int, out_w: int) -> Array:
    """Bilinear resize of (..., H, W, C) via jax.image (half-pixel centers,
    matching cv2.INTER_LINEAR used throughout the reference)."""
    out_shape = x.shape[:-3] + (out_h, out_w, x.shape[-1])
    return jax.image.resize(x, out_shape, method="linear")


def merge_grid(images: Array, rows: int, cols: int) -> Array:
    """(N, H, W, C) -> (rows*H, cols*W, C) sample grid (utils.py:35-46)."""
    n, h, w, c = images.shape
    if n < rows * cols:
        pad = jnp.zeros((rows * cols - n, h, w, c), images.dtype)
        images = jnp.concatenate([images, pad], axis=0)
    grid = images[:rows * cols].reshape(rows, cols, h, w, c)
    grid = jnp.transpose(grid, (0, 2, 1, 3, 4))
    return grid.reshape(rows * h, cols * w, c)


def to_uint8(x: Array) -> Array:
    """[0,1] float -> uint8 with round-half-away (matches np.around usage in
    z_model_lib.py:304)."""
    return jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)


def denorm_u8(x) -> "np.ndarray":
    """[-1, 1] float -> uint8, numpy (the inverse_transform + to_uint8 combo
    for host-side writers). One definition for every encoder call site."""
    import numpy as np

    x = np.asarray(x)
    return np.clip(np.round((x + 1.0) * 127.5), 0, 255).astype(np.uint8)
