"""Fused resize + normalize — the preprocessing hot transform, TPU-native.

Replaces the reference's per-frame cv2.resize + python [-1,1] transform
(z_model_lib.py:343-347, utils.py:57-63, track_faces.py:1037): every decoded
frame crosses this op on its way to the model.

TPU-first formulation: bilinear resize IS two small matmuls —
    out[i, j] = sum_{h, w} A[i, h] * img[h, w] * B[j, w]
with A/B the 1-D interpolation-weight matrices (cv2.INTER_LINEAR half-pixel
convention). On TPU that's MXU work, and the uint8->float conversion and
[-1, 1] normalization fuse into the same kernel, so a clip batch goes
HBM -> VMEM -> MXU -> HBM exactly once.

Two implementations with identical numerics:
  - `resize_normalize_ref`: pure jnp einsum (differentiable, any backend)
  - `resize_normalize`: Pallas kernel, grid over frames, frame block +
    both weight matrices resident in VMEM (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False


def interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) bilinear weights, cv2.INTER_LINEAR half-pixel
    centers: src = (dst + 0.5) * in/out - 0.5, edge-clamped."""
    scale = in_size / out_size
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        lo = int(np.floor(src))
        frac = src - lo
        lo_c = min(max(lo, 0), in_size - 1)
        hi_c = min(max(lo + 1, 0), in_size - 1)
        m[i, lo_c] += 1.0 - frac
        m[i, hi_c] += frac
    return m


def resize_normalize_ref(frames: jax.Array, out_h: int, out_w: int,
                         normalize: bool = True) -> jax.Array:
    """frames (N, H, W, C) uint8/float -> (N, out_h, out_w, C) float32 in
    [-1, 1] (when normalize)."""
    n, h, w, c = frames.shape
    a = jnp.asarray(interp_matrix(h, out_h))
    b = jnp.asarray(interp_matrix(w, out_w))
    x = frames.astype(jnp.float32)
    y = jnp.einsum("ih,nhwc,jw->nijc", a, x, b)
    return y / 127.5 - 1.0 if normalize else y


def _resize_kernel(plane_ref, a_ref, bt_ref, out_ref, *, normalize: bool):
    # plane block: (1, 1, H, W) — one channel plane of one frame.
    x = plane_ref[0, 0]
    if x.dtype == jnp.uint8:
        # Mosaic can't cast uint8->f32 directly; hop through int32.
        x = x.astype(jnp.int32)
    x = x.astype(jnp.float32)
    rows = jnp.dot(a_ref[:], x, preferred_element_type=jnp.float32)  # (oh, W)
    y = jnp.dot(rows, bt_ref[:], preferred_element_type=jnp.float32)  # (oh, ow)
    if normalize:
        y = y * (1.0 / 127.5) - 1.0
    out_ref[0, 0] = y


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "normalize",
                                             "interpret"))
def resize_normalize(frames: jax.Array, out_h: int, out_w: int,
                     normalize: bool = True,
                     interpret: bool = False) -> jax.Array:
    """Pallas fused resize+normalize. frames (N, H, W, C) -> (N, oh, ow, C)
    float32. Channel-planar inside the kernel (Mosaic-friendly 2-D matmuls):
    grid (N, C); each step DMAs one (H, W) plane + the weight matrices into
    VMEM and runs both interpolation matmuls on the MXU."""
    n, h, w, c = frames.shape
    a = jnp.asarray(interp_matrix(h, out_h))
    bt = jnp.asarray(interp_matrix(w, out_w).T)  # (W, ow)
    planes = jnp.transpose(frames, (0, 3, 1, 2))  # (N, C, H, W)

    kernel = functools.partial(_resize_kernel, normalize=normalize)
    specs = dict(memory_space=pltpu.VMEM) if _HAVE_PLTPU else {}
    out = pl.pallas_call(
        kernel,
        grid=(n, c),
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0), **specs),
            pl.BlockSpec((out_h, h), lambda i, j: (0, 0), **specs),
            pl.BlockSpec((w, out_w), lambda i, j: (0, 0), **specs),
        ],
        out_specs=pl.BlockSpec((1, 1, out_h, out_w),
                               lambda i, j: (i, j, 0, 0), **specs),
        out_shape=jax.ShapeDtypeStruct((n, c, out_h, out_w), jnp.float32),
        interpret=interpret,
    )(planes, a, bt)
    return jnp.transpose(out, (0, 2, 3, 1))
