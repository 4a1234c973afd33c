"""Shi-Tomasi corner detection + pyramidal Lucas-Kanade optical flow in JAX.

The reference stabilizer's compute core is OpenCV C++ (goodFeaturesToTrack +
calcOpticalFlowPyrLK, track_faces.py:495-509). This is the device-friendly
rebuild (SURVEY.md §2.4): corner response and image gradients are
convolutions; LK is a fixed-iteration 2x2 solve per tracked point — all
static-shaped (fixed max_corners with validity masks), jit-compiled once per
crop-shape bucket.

Used through `jax_flow_backend`, a drop-in for
gifgan_tpu.track.stabilize.cv2_flow_backend.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _conv2(img: Array, k: Array) -> Array:
    return jax.lax.conv_general_dilated(
        img[None, :, :, None], k[:, :, None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]


_SOBEL_X = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8.0
_SOBEL_Y = _SOBEL_X.T


def _gradients(img: Array) -> Tuple[Array, Array]:
    return _conv2(img, _SOBEL_X), _conv2(img, _SOBEL_Y)


@functools.partial(jax.jit, static_argnames=("max_corners", "block_size",
                                             "min_distance"))
def shi_tomasi_corners(img: Array, max_corners: int = 200,
                       quality: float = 0.01, min_distance: int = 8,
                       block_size: int = 7) -> Tuple[Array, Array]:
    """Corner points of a grayscale image.

    Returns (pts (max_corners, 2) float32 [x, y], valid (max_corners,) bool).
    Response = min eigenvalue of the windowed structure tensor (what
    goodFeaturesToTrack computes); non-max suppression via min_distance-sized
    grid cells; quality-relative threshold.
    """
    img = img.astype(jnp.float32)
    ix, iy = _gradients(img)
    box = jnp.ones((block_size, block_size), jnp.float32)
    sxx = _conv2(ix * ix, box)
    syy = _conv2(iy * iy, box)
    sxy = _conv2(ix * iy, box)
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    # min eigenvalue of [[sxx, sxy], [sxy, syy]]
    resp = tr / 2.0 - jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))

    h, w = img.shape
    # suppress borders (gradient window invalid there)
    m = block_size
    border = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) >= m) \
        & (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) < h - m) \
        & (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) >= m) \
        & (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) < w - m)
    resp = jnp.where(border, resp, 0.0)

    # non-max suppression: keep only per-cell maxima on a min_distance grid
    cell = max(int(min_distance), 1)
    ph = (-h) % cell
    pw = (-w) % cell
    rp = jnp.pad(resp, ((0, ph), (0, pw)))
    hh, ww2 = rp.shape
    cells = rp.reshape(hh // cell, cell, ww2 // cell, cell)
    cell_max = cells.max(axis=(1, 3))
    is_cell_max = rp == jnp.repeat(jnp.repeat(cell_max, cell, 0), cell, 1)[
        :hh, :ww2]
    resp = jnp.where(is_cell_max[:h, :w], resp, 0.0)

    thresh = quality * resp.max()
    resp = jnp.where(resp > thresh, resp, 0.0)

    flat = resp.ravel()
    vals, idx = jax.lax.top_k(flat, max_corners)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    pts = jnp.stack([xs, ys], axis=1)
    valid = vals > 0.0
    return pts, valid


def _bilinear(img: Array, x: Array, y: Array) -> Array:
    h, w = img.shape
    x0 = jnp.clip(jnp.floor(x), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y), 0, h - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    g00 = img[y0i, x0i]
    g01 = img[y0i, x0i + 1]
    g10 = img[y0i + 1, x0i]
    g11 = img[y0i + 1, x0i + 1]
    return (g00 * (1 - fx) * (1 - fy) + g01 * fx * (1 - fy)
            + g10 * (1 - fx) * fy + g11 * fx * fy)


def _pyr_down(img: Array) -> Array:
    k = jnp.array([1., 4., 6., 4., 1.], jnp.float32)
    k2 = jnp.outer(k, k) / 256.0
    sm = _conv2(img, k2)
    return sm[::2, ::2]


@functools.partial(jax.jit, static_argnames=("win", "levels", "iters"))
def lk_flow(img0: Array, img1: Array, pts: Array, valid: Array,
            win: int = 15, levels: int = 3, iters: int = 10,
            ) -> Tuple[Array, Array]:
    """Pyramidal LK: track pts (K, 2) from img0 to img1.

    Returns (new_pts (K, 2), status (K,) bool). Fixed window, fixed
    iterations, coarse-to-fine over `levels` pyramid levels — the standard
    calcOpticalFlowPyrLK recipe as pure array ops.
    """
    img0 = img0.astype(jnp.float32)
    img1 = img1.astype(jnp.float32)
    pyr0, pyr1 = [img0], [img1]
    for _ in range(levels - 1):
        if min(pyr0[-1].shape) < 2 * win:
            break
        pyr0.append(_pyr_down(pyr0[-1]))
        pyr1.append(_pyr_down(pyr1[-1]))
    n_levels = len(pyr0)

    r = win // 2
    dxs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(dxs, dxs, indexing="ij")   # window offsets

    flow = jnp.zeros_like(pts)
    for lvl in range(n_levels - 1, -1, -1):
        scale = 2.0 ** lvl
        p_lvl = pts / scale
        f = flow / scale
        i0, i1 = pyr0[lvl], pyr1[lvl]
        ix, iy = _gradients(i0)

        # gather fixed windows around each point in img0 (K, win, win)
        wx = p_lvl[:, 0, None, None] + gx[None]
        wy = p_lvl[:, 1, None, None] + gy[None]
        t0 = _bilinear(i0, wx, wy)
        gxw = _bilinear(ix, wx, wy)
        gyw = _bilinear(iy, wx, wy)
        a11 = (gxw * gxw).sum((1, 2))
        a12 = (gxw * gyw).sum((1, 2))
        a22 = (gyw * gyw).sum((1, 2))
        det = a11 * a22 - a12 * a12
        ok = det > 1e-6

        def body(_, f):
            t1 = _bilinear(i1, wx + f[:, 0, None, None],
                           wy + f[:, 1, None, None])
            dt = t1 - t0
            b1 = -(dt * gxw).sum((1, 2))
            b2 = -(dt * gyw).sum((1, 2))
            du = jnp.where(ok, (a22 * b1 - a12 * b2) / jnp.maximum(det, 1e-6),
                           0.0)
            dv = jnp.where(ok, (a11 * b2 - a12 * b1) / jnp.maximum(det, 1e-6),
                           0.0)
            return f + jnp.stack([du, dv], axis=1)

        f = jax.lax.fori_loop(0, iters, body, f)
        flow = f * scale

    new_pts = pts + flow
    h, w = img0.shape
    inb = ((new_pts[:, 0] >= 0) & (new_pts[:, 0] <= w - 1)
           & (new_pts[:, 1] >= 0) & (new_pts[:, 1] <= h - 1))
    # final structure-tensor validity at full res
    ix, iy = _gradients(img0)
    wx = pts[:, 0, None, None] + gx[None]
    wy = pts[:, 1, None, None] + gy[None]
    gxw = _bilinear(ix, wx, wy)
    gyw = _bilinear(iy, wx, wy)
    det = ((gxw * gxw).sum((1, 2)) * (gyw * gyw).sum((1, 2))
           - (gxw * gyw).sum((1, 2)) ** 2)
    status = valid & inb & (det > 1e-6)
    return new_pts, status


def jax_flow_backend(prev_crop: np.ndarray, crop: np.ndarray,
                     max_corners: int = 200, quality: float = 0.01,
                     min_distance: float = 8.0, block_size: int = 7,
                     win_size: int = 15, max_level: int = 3,
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Drop-in for stabilize.cv2_flow_backend: returns (pts0, pts1) of
    successfully tracked corner points."""
    if min(prev_crop.shape[:2]) <= block_size + 2 or \
            min(crop.shape[:2]) <= block_size + 2:
        return np.zeros((0, 2)), np.zeros((0, 2)), 0
    # shape buckets: crops vary per frame — pad to multiples of 16 so jit
    # compiles once per bucket
    def pad16(img):
        h, w = img.shape[:2]
        return np.pad(img.astype(np.float32),
                      (((-h) % 16 and (0, (-h) % 16)) or (0, 0),
                       ((-w) % 16 and (0, (-w) % 16)) or (0, 0)))

    p0 = pad16(prev_crop)
    p1 = np.pad(crop.astype(np.float32),
                ((0, p0.shape[0] - crop.shape[0]) if p0.shape[0] >= crop.shape[0] else (0, 0),
                 (0, p0.shape[1] - crop.shape[1]) if p0.shape[1] >= crop.shape[1] else (0, 0)))
    if p1.shape != p0.shape:  # crop larger than prev: clip
        p1 = p1[:p0.shape[0], :p0.shape[1]]

    pts, valid = shi_tomasi_corners(jnp.asarray(p0), max_corners, quality,
                                    int(min_distance), block_size)
    new_pts, status = lk_flow(jnp.asarray(p0), jnp.asarray(p1), pts, valid,
                              win=win_size, levels=max_level)
    # exclude corners that fell into the padding region
    h, w = prev_crop.shape[:2]
    pts_np, new_np = np.asarray(pts), np.asarray(new_pts)
    ok = (np.asarray(status) & (pts_np[:, 0] < w - 1)
          & (pts_np[:, 1] < h - 1))
    n_corners = int(np.asarray(valid).sum())
    return pts_np[ok], new_np[ok], n_corners
