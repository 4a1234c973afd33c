"""Pallas LK refinement kernel: fused iterate-resample-solve per level.

The MXU formulation (kernels/flow.py) re-materializes (K, win, win) windows
through one-hot matmuls every iteration. This kernel is the alternative
design from SURVEY.md §2.4 / TODO round 1 ("window DMA + VMEM-resident
pyramids"): the target image stays resident in VMEM and each corner's
window is loaded with a dynamic slice per iteration — zero matmuls, zero
re-materialization, one pallas_call per pyramid level.

The template windows (t0) and gradient windows (gx, gy) are invariant over
iterations, so they are computed once outside (kernels/flow.py sampling) and
passed in; only the img1 resample iterates.

Semantics target: cv2.calcOpticalFlowPyrLK inner loop
(reference track_faces.py:508-529); parity is statistical (3 px), same as
the other flow backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lk_refine_kernel(img1_ref, t0_ref, gx_ref, gy_ref, amat_ref, pts_ref,
                      flow_in_ref, flow_out_ref, *, win: int, iters: int,
                      n_corners: int):
    """Per-corner iterative LK solve. All refs VMEM.

    img1: (H, W) f32; t0/gx/gy: (K, win, win); amat: (K, 4) rows
    [a11, a12, a22, det]; pts: (K, 2) [x, y]; flow_in/out: (K, 2).
    """
    h = img1_ref.shape[0]
    w = img1_ref.shape[1]
    m = win + 1
    r = win // 2

    def corner_body(k, _):
        t0 = t0_ref[k]
        gx = gx_ref[k]
        gy = gy_ref[k]
        # row-vector loads (scalar VMEM loads/stores are not supported)
        amat = amat_ref[pl.ds(k, 1), :]
        a11, a12, a22, det = (amat[0, 0], amat[0, 1], amat[0, 2], amat[0, 3])
        ok = det > 1e-6
        safe_det = jnp.maximum(det, 1e-6)
        p = pts_ref[pl.ds(k, 1), :]
        px, py = p[0, 0], p[0, 1]

        def iter_body(_, f):
            fx_f, fy_f = f
            # integer-base (m, m) window at pts + flow - r, clamped in-frame
            x = px + fx_f - r
            y = py + fy_f - r
            bx = jnp.clip(jnp.floor(x), 0, w - m).astype(jnp.int32)
            by = jnp.clip(jnp.floor(y), 0, h - m).astype(jnp.int32)
            ax = jnp.clip(x - bx, 0.0, 1.0)
            ay = jnp.clip(y - by, 0.0, 1.0)
            # Mosaic vector loads need 8-aligned sublane / 128-aligned lane
            # indices: load an 8-ALIGNED full-width slab, then select the m
            # window rows and m window columns with two tiny one-hot matmuls
            # (MXU) — no unaligned dynamic indexing anywhere.
            m_pad = m + 8
            by_al = pl.multiple_of(
                jnp.minimum(by // 8, (h - m_pad) // 8) * 8, 8)
            off = by - by_al                                    # 0..m_pad-m
            slab = img1_ref[pl.ds(by_al, m_pad), :]             # (m_pad, W)
            ri = jax.lax.broadcasted_iota(jnp.int32, (m, m_pad), 0)
            rq = jax.lax.broadcasted_iota(jnp.int32, (m, m_pad), 1)
            rsel = (rq == off + ri).astype(slab.dtype)          # (m, m_pad)
            rows = jnp.dot(rsel, slab,
                           preferred_element_type=jnp.float32)  # (m, W)
            lane = jax.lax.broadcasted_iota(jnp.int32, (w, m), 0)
            coli = jax.lax.broadcasted_iota(jnp.int32, (w, m), 1)
            sel = (lane == bx + coli).astype(rows.dtype)        # (W, m)
            grid = jnp.dot(rows, sel,
                           preferred_element_type=jnp.float32)  # (m, m)
            t1 = ((1 - ax) * (1 - ay) * grid[:-1, :-1]
                  + ax * (1 - ay) * grid[:-1, 1:]
                  + (1 - ax) * ay * grid[1:, :-1]
                  + ax * ay * grid[1:, 1:])
            dt = t1 - t0
            b1 = -jnp.sum(dt * gx)
            b2 = -jnp.sum(dt * gy)
            du = jnp.where(ok, (a22 * b1 - a12 * b2) / safe_det, 0.0)
            dv = jnp.where(ok, (a11 * b2 - a12 * b1) / safe_det, 0.0)
            return (fx_f + du, fy_f + dv)

        fin = flow_in_ref[pl.ds(k, 1), :]
        f0 = (fin[0, 0], fin[0, 1])
        fx_f, fy_f = jax.lax.fori_loop(0, iters, iter_body, f0)
        row = jnp.concatenate([fx_f.reshape(1, 1), fy_f.reshape(1, 1)],
                              axis=1)
        flow_out_ref[pl.ds(k, 1), :] = row
        return 0

    jax.lax.fori_loop(0, n_corners, corner_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("win", "iters", "interpret"))
def lk_refine(img1, t0, gx, gy, amat, pts, flow, win: int, iters: int = 10,
              interpret: bool = False):
    """Refine per-corner flow against img1 for one pyramid level.

    img1 (H, W) f32, t0/gx/gy (K, win, win), amat (K, 4) [a11 a12 a22 det],
    pts (K, 2), flow (K, 2) -> (K, 2) refined flow.
    """
    k = t0.shape[0]
    kernel = functools.partial(_lk_refine_kernel, win=win, iters=iters,
                               n_corners=k)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k, 2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(img1.astype(jnp.float32), t0.astype(jnp.float32),
      gx.astype(jnp.float32), gy.astype(jnp.float32),
      amat.astype(jnp.float32), pts.astype(jnp.float32),
      flow.astype(jnp.float32))
