"""Batched Shi-Tomasi corners + pyramidal Lucas-Kanade flow, TPU-first.

The reference stabilizer's compute core is OpenCV C++ on the host
(goodFeaturesToTrack + calcOpticalFlowPyrLK, track_faces.py:495-529). The
pure-JAX rebuild (track/flow_jax.py) expresses window sampling as advanced-
indexing gathers — correct, but gathers serialize on TPU. This module is the
planned kernel replacement (SURVEY.md §2.4):

  * window sampling is reformulated as ONE-HOT MATMULS: a (K*win, H) row-
    selector times the image times a (W, K*win) column-selector. Selection
    matrices are built with iota comparisons (VPU) and the contraction runs
    on the MXU — zero gathers anywhere in the hot loop;
  * bilinear interpolation = integer-base window sampling (win+1 sized) + a
    4-shift fractional combine (VPU);
  * everything is batched over image PAIRS: the stabilizer's per-track,
    per-frame (prev_crop, crop) pairs stack into one (B, H, W) call, so one
    dispatch covers a whole clip worth of flow;
  * fixed iteration counts / fixed corner capacity with validity masks keep
    all shapes static (one compile per crop-shape bucket).

Parity: statistical, not bitwise — same contract as track/flow_jax.py
(3 px agreement with cv2 on tracked points; OpenCV internals are not
reproducible bit-for-bit, SURVEY.md §7.3).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# shared small ops (batched over leading B)
# ---------------------------------------------------------------------------

def _conv2_b(imgs: Array, k: Array) -> Array:
    """(B, H, W) x (kh, kw) SAME conv."""
    return jax.lax.conv_general_dilated(
        imgs[:, :, :, None], k[:, :, None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[:, :, :, 0]


_SOBEL_X = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8.0
_SOBEL_Y = _SOBEL_X.T


def _pyr_down_b(imgs: Array) -> Array:
    k = jnp.array([1., 4., 6., 4., 1.], jnp.float32)
    k2 = jnp.outer(k, k) / 256.0
    return _conv2_b(imgs, k2)[:, ::2, ::2]


# ---------------------------------------------------------------------------
# window sampling as one-hot matmuls
# ---------------------------------------------------------------------------

def sample_windows(img: Array, pts: Array, win: int) -> Array:
    """Bilinear windows around pts from a single image — no gathers.

    img: (H, W) f32. pts: (K, 2) float [x, y] window centers.
    Returns (K, win, win) where out[k, i, j] = bilinear(img,
    y=pts[k,1]+i-r, x=pts[k,0]+j-r), r = win//2.

    Mechanics: take integer-base windows of size win+1 via one-hot selector
    matmuls (MXU), then combine the 4 shifted sub-windows with the fractional
    weights (VPU).
    """
    h, w = img.shape
    k = pts.shape[0]
    r = win // 2
    base = jnp.floor(pts - r)                         # (K, 2) integer corner
    frac = pts - r - base                             # (K, 2) in [0, 1)
    bx = jnp.clip(base[:, 0], 0, w - (win + 1)).astype(jnp.int32)
    by = jnp.clip(base[:, 1], 0, h - (win + 1)).astype(jnp.int32)
    # clamping shifts the window; keep the fractional part consistent
    fx = jnp.clip(pts[:, 0] - r - bx, 0.0, 1.0)
    fy = jnp.clip(pts[:, 1] - r - by, 0.0, 1.0)

    m = win + 1
    # row selector: (K*m, H) one-hot rows by = by[k] + i
    rows_idx = (by[:, None] + jnp.arange(m)[None, :]).reshape(-1)   # (K*m,)
    hh = jax.lax.broadcasted_iota(jnp.int32, (k * m, h), 1)
    rsel = (hh == rows_idx[:, None]).astype(img.dtype)
    rows = rsel @ img                                               # (K*m, W)
    # column selector per k: (K, m, W) one-hot -> batched contraction on MXU
    cols_idx = bx[:, None] + jnp.arange(m)[None, :]                 # (K, m)
    ww = jax.lax.broadcasted_iota(jnp.int32, (k, m, w), 2)
    csel = (ww == cols_idx[:, :, None]).astype(img.dtype)           # (K, m, W)
    grid = jnp.einsum("kiw,kjw->kij", rows.reshape(k, m, w), csel,
                      preferred_element_type=jnp.float32)           # (K, m, m)

    w00 = ((1 - fx) * (1 - fy))[:, None, None]
    w01 = (fx * (1 - fy))[:, None, None]
    w10 = ((1 - fx) * fy)[:, None, None]
    w11 = (fx * fy)[:, None, None]
    return (w00 * grid[:, :-1, :-1] + w01 * grid[:, :-1, 1:]
            + w10 * grid[:, 1:, :-1] + w11 * grid[:, 1:, 1:])


# ---------------------------------------------------------------------------
# batched Shi-Tomasi
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_corners", "block_size",
                                             "min_distance"))
def shi_tomasi_corners_batch(imgs: Array, max_corners: int = 200,
                             quality: float = 0.01, min_distance: int = 8,
                             block_size: int = 7) -> Tuple[Array, Array]:
    """Corners for a stack of grayscale images.

    imgs: (B, H, W). Returns (pts (B, max_corners, 2) [x, y] f32,
    valid (B, max_corners) bool). Same semantics as goodFeaturesToTrack:
    min-eigenvalue response, quality-relative threshold, grid-cell NMS.
    """
    imgs = imgs.astype(jnp.float32)
    b, h, w = imgs.shape
    ix = _conv2_b(imgs, _SOBEL_X)
    iy = _conv2_b(imgs, _SOBEL_Y)
    box = jnp.ones((block_size, block_size), jnp.float32)
    sxx = _conv2_b(ix * ix, box)
    syy = _conv2_b(iy * iy, box)
    sxy = _conv2_b(ix * iy, box)
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    resp = tr / 2.0 - jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))

    m = block_size
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = ((rows >= m) & (rows < h - m) & (cols >= m) & (cols < w - m))
    resp = jnp.where(border[None], resp, 0.0)

    cell = max(int(min_distance), 1)
    ph, pw = (-h) % cell, (-w) % cell
    rp = jnp.pad(resp, ((0, 0), (0, ph), (0, pw)))
    hh, ww2 = rp.shape[1:]
    cells = rp.reshape(b, hh // cell, cell, ww2 // cell, cell)
    cmax = cells.max(axis=(2, 4))
    is_max = rp == jnp.repeat(jnp.repeat(cmax, cell, 1), cell, 2)
    resp = jnp.where(is_max[:, :h, :w], resp, 0.0)

    thresh = quality * resp.max(axis=(1, 2), keepdims=True)
    resp = jnp.where(resp > thresh, resp, 0.0)

    vals, idx = jax.lax.top_k(resp.reshape(b, -1), max_corners)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    return jnp.stack([xs, ys], axis=-1), vals > 0.0


# ---------------------------------------------------------------------------
# batched pyramidal LK
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("win", "levels", "iters",
                                             "pallas_refine"))
def lk_flow_batch(img0s: Array, img1s: Array, pts: Array, valid: Array,
                  win: int = 15, levels: int = 3, iters: int = 10,
                  pallas_refine: str = "off") -> Tuple[Array, Array]:
    """Track pts (B, K, 2) from img0s to img1s, (B, H, W) each.

    Returns (new_pts (B, K, 2), status (B, K) bool). Coarse-to-fine, fixed
    window/iterations; all window sampling via `sample_windows` matmuls.

    pallas_refine: "off" runs the iteration loop via matmul resampling;
    "tpu"/"interpret" runs it through the fused VMEM-resident Pallas kernel
    (kernels/flow_pallas.py) — same solve, window loads by dynamic slice.
    """
    img0s = img0s.astype(jnp.float32)
    img1s = img1s.astype(jnp.float32)
    pyr0, pyr1 = [img0s], [img1s]
    for _ in range(levels - 1):
        if min(pyr0[-1].shape[1:]) < 2 * win:
            break
        pyr0.append(_pyr_down_b(pyr0[-1]))
        pyr1.append(_pyr_down_b(pyr1[-1]))
    n_levels = len(pyr0)

    sample_b = jax.vmap(sample_windows, in_axes=(0, 0, None))

    flow = jnp.zeros_like(pts)
    for lvl in range(n_levels - 1, -1, -1):
        scale = 2.0 ** lvl
        p_lvl = pts / scale
        f = flow / scale
        i0, i1 = pyr0[lvl], pyr1[lvl]
        ix = _conv2_b(i0, _SOBEL_X)
        iy = _conv2_b(i0, _SOBEL_Y)

        t0 = sample_b(i0, p_lvl, win)                 # (B, K, win, win)
        gxw = sample_b(ix, p_lvl, win)
        gyw = sample_b(iy, p_lvl, win)
        a11 = (gxw * gxw).sum((-1, -2))
        a12 = (gxw * gyw).sum((-1, -2))
        a22 = (gyw * gyw).sum((-1, -2))
        det = a11 * a22 - a12 * a12
        ok = det > 1e-6
        safe_det = jnp.maximum(det, 1e-6)

        if pallas_refine != "off":
            from gifgan_tpu.kernels.flow_pallas import lk_refine

            amat = jnp.stack([a11, a12, a22, det], axis=-1)  # (B, K, 4)
            refined = []
            for bi in range(img0s.shape[0]):   # B is static; one call each
                refined.append(lk_refine(
                    i1[bi], t0[bi], gxw[bi], gyw[bi], amat[bi], p_lvl[bi],
                    f[bi], win=win, iters=iters,
                    interpret=(pallas_refine == "interpret")))
            f = jnp.stack(refined)
        else:
            def body(_, f):
                t1 = sample_b(i1, p_lvl + f, win)
                dt = t1 - t0
                b1 = -(dt * gxw).sum((-1, -2))
                b2 = -(dt * gyw).sum((-1, -2))
                du = jnp.where(ok, (a22 * b1 - a12 * b2) / safe_det, 0.0)
                dv = jnp.where(ok, (a11 * b2 - a12 * b1) / safe_det, 0.0)
                return f + jnp.stack([du, dv], axis=-1)

            f = jax.lax.fori_loop(0, iters, body, f)
        flow = f * scale

    new_pts = pts + flow
    h, w = img0s.shape[1:]
    inb = ((new_pts[..., 0] >= 0) & (new_pts[..., 0] <= w - 1)
           & (new_pts[..., 1] >= 0) & (new_pts[..., 1] <= h - 1))
    ix = _conv2_b(img0s, _SOBEL_X)
    iy = _conv2_b(img0s, _SOBEL_Y)
    gxw = sample_b(ix, pts, win)
    gyw = sample_b(iy, pts, win)
    det = ((gxw * gxw).sum((-1, -2)) * (gyw * gyw).sum((-1, -2))
           - (gxw * gyw).sum((-1, -2)) ** 2)
    return new_pts, valid & inb & (det > 1e-6)


# ---------------------------------------------------------------------------
# drop-in stabilizer backend (single pair; batching happens via flow_pairs)
# ---------------------------------------------------------------------------

def _pad_pair(prev_crop: np.ndarray, crop: np.ndarray):
    """Pad both crops to a common multiple-of-32 bucket shape so jit
    compiles once per bucket."""
    h = max(prev_crop.shape[0], crop.shape[0])
    w = max(prev_crop.shape[1], crop.shape[1])
    hb, wb = -(-h // 32) * 32, -(-w // 32) * 32

    def pad(img):
        return np.pad(img.astype(np.float32),
                      ((0, hb - img.shape[0]), (0, wb - img.shape[1])))

    return pad(prev_crop), pad(crop)


def flow_pairs(prev_crops: np.ndarray, crops: np.ndarray,
               max_corners: int = 200, quality: float = 0.01,
               min_distance: float = 8.0, block_size: int = 7,
               win_size: int = 15, max_level: int = 3):
    """Batched corner+flow over stacked pairs (B, H, W) -> host arrays
    (pts (B, K, 2), new_pts (B, K, 2), status (B, K), n_corners (B,))."""
    pts, valid = shi_tomasi_corners_batch(
        jnp.asarray(prev_crops), max_corners, quality, int(min_distance),
        block_size)
    new_pts, status = lk_flow_batch(jnp.asarray(prev_crops),
                                    jnp.asarray(crops), pts, valid,
                                    win=win_size, levels=max_level)
    return (np.asarray(pts), np.asarray(new_pts), np.asarray(status),
            np.asarray(valid.sum(axis=1)))


def mxu_flow_backend(prev_crop: np.ndarray, crop: np.ndarray,
                     max_corners: int = 200, quality: float = 0.01,
                     min_distance: float = 8.0, block_size: int = 7,
                     win_size: int = 15, max_level: int = 3,
                     ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Drop-in for stabilize.cv2_flow_backend using the matmul kernels."""
    if min(prev_crop.shape[:2]) <= block_size + 2 or \
            min(crop.shape[:2]) <= block_size + 2:
        return np.zeros((0, 2)), np.zeros((0, 2)), 0
    p0, p1 = _pad_pair(prev_crop, crop)
    pts, new_pts, status, n_corners = flow_pairs(
        p0[None], p1[None], max_corners, quality, min_distance,
        block_size, win_size, max_level)
    h, w = prev_crop.shape[:2]
    ok = (status[0] & (pts[0, :, 0] < w - 1) & (pts[0, :, 1] < h - 1))
    return pts[0][ok], new_pts[0][ok], int(n_corners[0])
