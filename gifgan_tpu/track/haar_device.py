"""Pyramid-packed, gather-free Haar cascade evaluation on TPU.

The existing device path (haar.py JaxStageEvaluator) gathers integral-image
corners per window (`ii[ys, xs]`) — and gathers are the one thing the TPU
does badly, which is why the C++ host evaluator stayed the default. This
module is the TPU-native redesign (SURVEY.md §2.4's "batched multi-scale
window scoring"), built on three observations:

  1. **Image pyramid instead of feature scaling** (OpenCV's old-format
     detectMultiScale strategy): every level evaluates the cascade at its
     base 20x20 window over a bilinear-downscaled image, so the feature
     geometry is a compile-time constant shared by all scales.
  2. **All levels pack into one canvas**: each level's (Hk+1, Wk+1)
     integral-image block is stacked at an even row offset. Window origins
     of every scale then live on ONE stride-2 grid over the canvas.
  3. **On a regular window grid, a rect sum is a strided slice**: the
     corner value `ii[y0 + dy, x0 + dx]` for all grid origins (y0, x0)
     at once is `lax.slice(ii, (dy, dx), ..., strides=(s, s))` — ZERO
     gathers; the whole cascade becomes elementwise VPU arithmetic
     batched over frames.

Execution is ONE device dispatch + a host finisher per clip:
  - dispatch: pyramid resize (separable matmuls) + integral images + early
    stages for ALL windows x ALL scales x ALL frames in one gather-free
    program -> bit-packed alive mask (8 bools/byte via a tiny matmul).
    Input uploads as uint8 and the mask fetches at 1/8 size: the axon
    relay moves ~35 MB/s, so shipping the raw (T, ny, nx) bool mask cost
    287 ms/clip and the f32 frames 80 ms — more than the compute itself
    (jnp.flatnonzero compaction was tried too: its 10M-element device
    scatter cost ~140 ms);
  - survivors (a few hundred, clustered around faces) finish on host via
    the C++ early-exit evaluator (native/haarcascade.cpp
    gifgan_haar_eval_pyramid): it re-derives the level images with the
    same separable triangle kernel, then runs the branchy per-window deep
    stages (~30 features average) — exactly the CPU's case. A device
    gather formulation of this pass was measured first: 1.2 s per
    4096-survivor bucket (TPU gathers), vs ~1 ms in C++; the numpy-matmul
    canvas rebuild it replaced cost 215 ms/clip.

Semantics vs the feature-scaled backends (HaarDetector / NativeHaarDetector)
differ exactly the way OpenCV's old-format path differs from its new-format
path: image resampling vs integer rect scaling. Parity is therefore
statistical (detection agreement on real faces, noise rejection), tested in
tests/test_haar_device.py — consistent with the repo-wide rule that OpenCV
bit-exactness is a non-goal (SURVEY.md §7.3).

Reference behavior being replaced: cv2.CascadeClassifier.detectMultiScale
(track_faces.py:243,260-262; facedetect.py:164; webcam_client.py:49).
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Tuple

import numpy as np

from gifgan_tpu.track.haar import (HaarCascade, group_rectangles,
                                   integral_images, parse_cascade,
                                   _eval_stages, _scaled_rects)


class _Level(NamedTuple):
    scale: float   # detected-size multiplier (original px / level px)
    h: int         # level image height
    w: int         # level image width
    row: int       # canvas row where this level's ii block starts (even)


def _plan_levels(cas: HaarCascade, h: int, w: int, scale_factor: float,
                 min_size: int, max_size_factor: float) -> List[_Level]:
    side = math.sqrt(h * w)
    max_len = side * max_size_factor
    levels = []
    row = 0
    scale = max(min_size / cas.window_w, 1.0)
    while True:
        ww = int(round(cas.window_w * scale))
        wh = int(round(cas.window_h * scale))
        if ww > min(w, max_len) or wh > min(h, max_len):
            break
        lh, lw = int(round(h / scale)), int(round(w / scale))
        if lh < cas.window_h or lw < cas.window_w:
            break
        levels.append(_Level(scale, lh, lw, row))
        # ii block is (lh+1) rows; keep the next block at an even offset so
        # all levels' window origins share one stride-2 canvas grid.
        row += ((lh + 1 + 1) // 2) * 2
        scale *= scale_factor
    return levels


def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Antialiased linear (triangle-kernel) resampling matrix (n_out, n_in),
    the separable equivalent of jax.image.resize 'bilinear' — precomputed on
    host so device resize is two small matmuls per level instead of
    jax.image.resize's TPU lowering (which materialized a 64 GB temp for a
    16-frame 128px pyramid)."""
    scale = n_in / n_out
    support = max(scale, 1.0)
    out = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        center = (i + 0.5) * scale - 0.5
        lo = int(math.floor(center - support))
        hi = int(math.ceil(center + support))
        js = np.arange(lo, hi + 1)
        w = np.maximum(0.0, 1.0 - np.abs(js - center) / support)
        js = np.clip(js, 0, n_in - 1)
        for j, wt in zip(js, w):
            out[i, j] += wt
        # sequential f32 row sum (not numpy's pairwise .sum()): the C++
        # finisher's resample_weights replicates exactly this ordering so
        # both sides normalize by the bit-identical denominator
        s = np.float32(0.0)
        for v in out[i]:
            s = np.float32(s + v)
        out[i] /= s
    return out


def _unrolled_stages(cas: HaarCascade, rects: np.ndarray, rect_grid,
                     nf, alive, n_stages: int):
    """The cascade's first `n_stages` stages as fully unrolled elementwise
    arithmetic over a window grid, used by the XLA whole-clip program.
    `rect_grid(x0, y0, rw, rh)` returns the rect sum at every grid origin;
    children codes and thresholds are compile-time scalars, so each
    depth-2 tree is pure selects — no table gathers. (The Pallas band
    kernel uses its own rolled fori_loop body instead: an unrolled kernel
    never finished Mosaic compilation — docs/PROFILE.md round 3.)"""
    import jax.numpy as jnp

    inv_area = 1.0 / (cas.window_w * cas.window_h)
    fcache: Dict[int, object] = {}

    def fval(fi: int):
        if fi in fcache:
            return fcache[fi]
        acc = None
        for r in range(3):
            x0, y0, rw, rh, wt = rects[fi, r]
            if wt == 0.0:
                continue
            g = rect_grid(int(x0), int(y0), int(rw), int(rh)) * float(wt)
            acc = g if acc is None else acc + g
        out = acc * inv_area
        fcache[fi] = out
        return out

    for s in range(n_stages):
        a = int(cas.stage_first[s])
        b = a + int(cas.stage_count[s])
        total = None
        for tr in range(a, b):
            f0 = fval(int(cas.node_feat[tr, 0]))
            go0 = f0 < float(cas.node_thr[tr, 0]) * nf
            l0, r0 = int(cas.node_left[tr, 0]), int(cas.node_right[tr, 0])
            node1 = None

            def node1_val():
                nonlocal node1
                if node1 is None:
                    f1 = fval(int(cas.node_feat[tr, 1]))
                    go1 = f1 < float(cas.node_thr[tr, 1]) * nf
                    node1 = jnp.where(
                        go1,
                        float(cas.leaves[tr][-int(cas.node_left[tr, 1])]),
                        float(cas.leaves[tr][-int(cas.node_right[tr, 1])]))
                return node1

            v_left = (float(cas.leaves[tr][-l0]) if l0 <= 0
                      else node1_val())
            v_right = (float(cas.leaves[tr][-r0]) if r0 <= 0
                       else node1_val())
            t_val = jnp.where(go0, v_left, v_right)
            total = t_val if total is None else total + t_val
        alive = alive & (total >= float(cas.stage_thr[s]))
        fcache.clear()
    return alive


class DeviceHaarDetector:
    """detectMultiScale-equivalent detector; all scales and frames of a clip
    evaluated in one gather-free device program. Exposes the same
    detect_rects / detect_batch / detect_video / __call__ surface as the
    haar.py detectors."""

    def __init__(self, cascade_path: str, scale_factor: float = 1.1,
                 min_neighbors: int = 3, min_size: int = 20,
                 max_size_factor: float = 1.0, early_stages: int = 10,
                 stride: int = 1, use_pallas: bool = None):
        if scale_factor <= 1.0:
            raise ValueError(
                f"scale_factor must be > 1.0, got {scale_factor} "
                "(the pyramid level planner multiplies by it until the "
                "window outgrows the image; <= 1.0 never terminates)")
        self.cas = parse_cascade(cascade_path)
        self.scale_factor = scale_factor
        self.min_neighbors = min_neighbors
        self.min_size = min_size
        self.max_size_factor = max_size_factor
        self.early_stages = min(early_stages, len(self.cas.stage_thr))
        self.stride = stride
        # use_pallas=True opts into the Pallas band kernel for the early
        # stages (stride 1 only); default is the XLA strided-slice
        # formulation — see the note in _build_program
        self.use_pallas = use_pallas
        self._pallas_interpret = False   # tests: run the kernel on CPU
        self._deep_eval = None
        self._native = None  # (lib, handle, keepalive) when in use
        # base-scale rects: _scaled_rects at 1.0 only re-derives the
        # first-rect weight from the others (exact, no rounding)
        self.rects0 = _scaled_rects(self.cas, 1.0)
        ex = self.rects0[:, :, 0] + self.rects0[:, :, 2]
        ey = self.rects0[:, :, 1] + self.rects0[:, :, 3]
        self.ext_x = int(max(self.cas.window_w, ex.max()))
        self.ext_y = int(max(self.cas.window_h, ey.max()))
        self._progs: Dict[Tuple[int, int, int], tuple] = {}

    # -- program construction -------------------------------------------

    def _grid_meta(self, levels: List[_Level], canvas_h: int, canvas_w: int):
        """Static per-canvas-grid arrays: validity + level id + local x/y."""
        st = self.stride
        # corner slices reach gy*st + ext_y and gx*st + ext_x; keep them
        # strictly inside the canvas
        ny = (canvas_h - 1 - self.ext_y) // st + 1
        nx = (canvas_w - 1 - self.ext_x) // st + 1
        valid = np.zeros((ny, nx), bool)
        level_id = np.full((ny, nx), -1, np.int32)
        for li, lv in enumerate(levels):
            # valid local origins: x in [0, lw - ext_x], y in [0, lh - ext_y]
            y0 = lv.row // st
            y1 = y0 + (lv.h - self.ext_y) // st + 1
            x1 = (lv.w - self.ext_x) // st + 1
            if y1 <= y0 or x1 <= 0:
                continue
            y1 = min(y1, ny)
            x1 = min(x1, nx)
            valid[y0:y1, :x1] = True
            level_id[y0:y1, :x1] = li
        return ny, nx, valid, level_id

    def _build_program(self, t: int, h: int, w: int):
        import jax
        import jax.numpy as jnp

        cas = self.cas
        levels = _plan_levels(cas, h, w, self.scale_factor, self.min_size,
                              self.max_size_factor)
        if not levels:
            return None
        last = levels[-1]
        canvas_h = last.row + ((last.h + 1 + 1) // 2) * 2 + self.ext_y
        canvas_w = max(lv.w for lv in levels) + 1
        ny, nx, valid, level_id = self._grid_meta(levels, canvas_h, canvas_w)
        st = self.stride
        rects = self.rects0
        ww, wh = cas.window_w, cas.window_h
        inv_area = 1.0 / (ww * wh)
        valid_j = jnp.asarray(valid)

        def corner(img, dy: int, dx: int):
            """(T, canvas) -> (T, ny, nx): img[:, gy+dy, gx+dx] over the
            stride-`st` origin grid — a pure strided slice."""
            return jax.lax.slice(
                img, (0, dy, dx),
                (t, dy + (ny - 1) * st + 1, dx + (nx - 1) * st + 1),
                (1, st, st))

        def rect_grid(img, x0: int, y0: int, rw: int, rh: int):
            return (corner(img, y0, x0) + corner(img, y0 + rh, x0 + rw)
                    - corner(img, y0, x0 + rw) - corner(img, y0 + rh, x0))

        np_mats = [(_resize_matrix(h, lv.h).astype(np.float64),
                    _resize_matrix(w, lv.w).astype(np.float64))
                   for lv in levels]
        resize_mats = [
            (jnp.asarray(mh, jnp.float32), jnp.asarray(mw.T, jnp.float32))
            for mh, mw in np_mats]

        # default OFF: the band kernel is correct (interpret-tested vs the
        # XLA path) and its slab DMA removes the XLA formulation's ~44 MB
        # HBM pass per corner slice, but Mosaic could not compile the
        # ~230-tree unrolled body in practical time through the
        # remote-compile tunnel (>35 min, killed; a trivial DMA kernel
        # compiles in seconds). Opt in with use_pallas=True.
        use_pallas = bool(self.use_pallas) and st == 1
        if use_pallas:
            # Mosaic HBM slices must align to the (8, 128) f32 tiling:
            # band offsets/heights to 8 sublanes, slab width to 128 lanes
            band_h = min(512, -(-ny // 8) * 8)
            nbands = -(-ny // band_h)
            ey_pad = -(-self.ext_y // 8) * 8
            cw_pad = -(-canvas_w // 128) * 128
            stage_call = self._build_stage_kernel(
                t, ny, nx, cw_pad, valid, band_h, nbands, ey_pad)
        else:
            band_h = nbands = stage_call = ey_pad = cw_pad = None

        def program(grays_u8):
            # grays_u8: (T, h, w) uint8 — cast on device; the u8 upload is
            # 4x smaller than f32 over the ~35 MB/s relay
            grays = grays_u8.astype(jnp.float32)
            blocks_ii, blocks_ii2 = [], []
            for lv, (mh, mw) in zip(levels, resize_mats):
                g = jnp.einsum("ah,thw,wb->tab", mh, grays, mw)
                ii = jnp.pad(jnp.cumsum(jnp.cumsum(g, 1), 2),
                             ((0, 0), (1, 0), (1, 0)))
                # squared integral over OFFSET pixels: (g-128)^2 <= 16384
                # keeps the full-canvas cumsum <= ~2^30 (vs ~2^32 for raw
                # g^2), cutting f32 corner rounding 4x; window variance is
                # shift-invariant, so downstream uses (mean-128) instead of
                # mean (advisor finding r1: raw-g^2 rounding could falsely
                # kill threshold-adjacent windows in the early stages,
                # which the f64 host finisher never re-checks)
                gc = g - 128.0
                ii2 = jnp.pad(jnp.cumsum(jnp.cumsum(gc * gc, 1), 2),
                              ((0, 0), (1, 0), (1, 0)))
                block_h = ((lv.h + 1 + 1) // 2) * 2
                pad = ((0, 0), (0, block_h - (lv.h + 1)),
                       (0, canvas_w - (lv.w + 1)))
                blocks_ii.append(jnp.pad(ii, pad))
                blocks_ii2.append(jnp.pad(ii2, pad))
            tail = canvas_h - sum(b.shape[1] for b in blocks_ii)
            zpad = jnp.zeros((t, tail, canvas_w), jnp.float32)
            ii = jnp.concatenate(blocks_ii + [zpad], axis=1)
            ii2 = jnp.concatenate(blocks_ii2 + [zpad], axis=1)

            if use_pallas:
                # the band kernel reads slabs of rows [b*BH, b*BH+SH); pad
                # the canvases so every slab DMA is in-bounds and aligned
                h_pad = nbands * band_h + ey_pad
                ii = jnp.pad(ii, ((0, 0), (0, h_pad - canvas_h),
                                  (0, cw_pad - canvas_w)))
                ii2 = jnp.pad(ii2, ((0, 0), (0, h_pad - canvas_h),
                                    (0, cw_pad - canvas_w)))
                alive = stage_call(ii, ii2)[:, :ny, :] != 0
            else:
                # window variance-normalization factor over the grid
                s1 = rect_grid(ii, 0, 0, ww, wh)
                s2 = rect_grid(ii2, 0, 0, ww, wh)
                # s2 is over offset pixels (g-128)^2: var = E[(g-128)^2]
                # - (mean-128)^2 (shift-invariant)
                mean_c = s1 * inv_area - 128.0
                var = s2 * inv_area - mean_c * mean_c
                nf = jnp.where(var > 0, jnp.sqrt(jnp.maximum(var, 0.0)),
                               1.0)
                alive = _unrolled_stages(
                    cas, rects,
                    lambda x0, y0, rw, rh: rect_grid(ii, x0, y0, rw, rh),
                    nf, jnp.broadcast_to(valid_j, (t, ny, nx)),
                    self.early_stages)
            # bit-pack the mask on device (8 bools -> 1 byte via a tiny
            # matmul; np.unpackbits-compatible big bit order): the relay
            # moves ~35 MB/s, so the raw bool mask cost 287 ms to fetch.
            # jnp.flatnonzero(size=cap) was tried first: its 10M-element
            # scatter burned ~140 ms on device — worse than shipping bits.
            flat = alive.reshape(-1)
            pad = (-flat.size) % 8
            fpad = jnp.pad(flat, (0, pad))
            bit_w = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.float32)
            packed = (fpad.reshape(-1, 8).astype(jnp.float32)
                      @ bit_w).astype(jnp.uint8)
            return packed

        fn = jax.jit(program)
        return fn, levels, ny, nx, valid, level_id, np_mats, canvas_h

    def _cascade_params_rolled(self, n_early: int):
        """Flat per-tree parameter arrays for the rolled kernel: geometry
        (x0, y0, rw, rh) and weight per rect per node, node thresholds,
        the four possible leaf values, and leaf-vs-subtree flags for node
        0's children. Absent rects/nodes get zero weights/thresholds so the
        uniform per-tree arithmetic evaluates to the right value."""
        cas = self.cas
        rects = self.rects0
        n_trees = int(cas.stage_first[n_early - 1]
                      + cas.stage_count[n_early - 1])
        geo = np.zeros((n_trees, 2, 3, 4), np.int32)
        wts = np.zeros((n_trees, 2, 3), np.float32)
        thr = np.zeros((n_trees, 2), np.float32)
        leaf = np.zeros((n_trees, 4), np.float32)  # L0, R0, n1L, n1R
        flg = np.zeros((n_trees, 2), np.float32)   # node0 child is leaf?
        # stage bookkeeping for the single rolled loop: after the last
        # tree of each stage, compare the running total to stage_thr and
        # reset it — one fori_loop over all trees instead of one per
        # stage (compile time scales with loop-body count)
        is_last = np.zeros((n_trees,), np.float32)
        sthr = np.zeros((n_trees,), np.float32)
        for s in range(n_early):
            e = int(cas.stage_first[s] + cas.stage_count[s]) - 1
            is_last[e] = 1.0
            sthr[e] = cas.stage_thr[s]
        for tr in range(n_trees):
            l0 = int(cas.node_left[tr, 0])
            r0 = int(cas.node_right[tr, 0])
            flg[tr, 0] = 1.0 if l0 <= 0 else 0.0
            flg[tr, 1] = 1.0 if r0 <= 0 else 0.0
            if l0 <= 0:
                leaf[tr, 0] = cas.leaves[tr][-l0]
            if r0 <= 0:
                leaf[tr, 1] = cas.leaves[tr][-r0]
            nodes = [0]
            thr[tr, 0] = cas.node_thr[tr, 0]
            if l0 > 0 or r0 > 0:
                nodes.append(1)
                thr[tr, 1] = cas.node_thr[tr, 1]
                leaf[tr, 2] = cas.leaves[tr][-int(cas.node_left[tr, 1])]
                leaf[tr, 3] = cas.leaves[tr][-int(cas.node_right[tr, 1])]
            for n in nodes:
                fid = int(cas.node_feat[tr, n])
                for r in range(3):
                    x0, y0, rw, rh, wt = rects[fid, r]
                    if wt == 0.0:
                        continue
                    geo[tr, n, r] = (int(x0), int(y0), int(rw), int(rh))
                    wts[tr, n, r] = wt
        # pack each rect's (x0, y0, rw, rh) into one int32 (5 bits each):
        # SMEM capacity is ~1 MB with heavy per-element overhead — the
        # unpacked (N, 2, 3, 4) array alone blew it
        assert geo.max() < 32, geo.max()
        pgeo = (geo[..., 0] | (geo[..., 1] << 5) | (geo[..., 2] << 10)
                | (geo[..., 3] << 15)).astype(np.int32)
        return n_trees, pgeo, wts, thr, leaf, flg, is_last, sthr

    def _build_stage_kernel(self, t: int, ny: int, nx: int, canvas_w: int,
                            valid: np.ndarray, band_h: int, nbands: int,
                            ey_pad: int):
        """Pallas early-stage kernel: grid (frame, row band); each program
        DMAs an overlapping (band_h + halo, canvas_w) ii/ii2 slab from HBM
        into VMEM and evaluates the cascade stages as in-VMEM elementwise
        arithmetic. The XLA formulation leaves each corner slice as a
        separate ~44 MB HBM pass (~120 ms/clip at 16x256px); here the
        slabs are read once (~1 MB x 2 per band).

        The tree loop is ROLLED (lax.fori_loop over trees, per-tree
        geometry/thresholds/leaves as SMEM scalar arrays, dynamic VMEM
        slices for the rect corners): a fully unrolled ~230-tree body is
        bit-identical but Mosaic could not compile it in practical time
        (>35 min; see docs/PROFILE.md round 3)."""
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        cas = self.cas
        sh = band_h + ey_pad   # 8-aligned slab height (halo >= ext_y)
        ww, wh = cas.window_w, cas.window_h
        inv_area = 1.0 / (ww * wh)
        n_early = self.early_stages
        valid_pad = np.zeros((nbands * band_h, nx), np.int8)
        valid_pad[:ny] = valid[:ny].astype(np.int8)
        valid_pad = jnp.asarray(valid_pad)
        n_trees, geo, wts, thr, leaf, flg, is_last, sthr = \
            self._cascade_params_rolled(n_early)

        def kernel(geo_s, wts_s, thr_s, leaf_s, flg_s, last_s, sthr_s,
                   valid_ref, ii_hbm, ii2_hbm, out_ref):
            fi = pl.program_id(0)
            b = pl.program_id(1)

            def body(s1ref, s2ref, sem):
                row0 = b * band_h
                cp1 = pltpu.make_async_copy(
                    ii_hbm.at[fi, pl.ds(row0, sh), :], s1ref, sem.at[0])
                cp2 = pltpu.make_async_copy(
                    ii2_hbm.at[fi, pl.ds(row0, sh), :], s2ref, sem.at[1])
                cp1.start()
                cp2.start()
                cp1.wait()
                cp2.wait()

                def srect(ref, x0, y0, rw, rh):
                    # static offsets: plain slices
                    return (ref[y0:y0 + band_h, x0:x0 + nx]
                            + ref[y0 + rh:y0 + rh + band_h,
                                  x0 + rw:x0 + rw + nx]
                            - ref[y0:y0 + band_h, x0 + rw:x0 + rw + nx]
                            - ref[y0 + rh:y0 + rh + band_h, x0:x0 + nx])

                s1 = srect(s1ref, 0, 0, ww, wh)
                s2 = srect(s2ref, 0, 0, ww, wh)
                # ii2 canvas is over offset pixels (g-128)^2; see program()
                mean_c = s1 * inv_area - 128.0
                var = s2 * inv_area - mean_c * mean_c
                nf = jnp.where(var > 0, jnp.sqrt(jnp.maximum(var, 0.0)),
                               1.0)

                # dynamic (per-tree, SMEM-read) offsets: Mosaic rejects
                # dynamic sublane/lane slice starts ("cannot statically
                # prove index is a multiple of 8"), so shift via
                # pltpu.roll with a NON-NEGATIVE shift (roll(v, s)[i] =
                # v[(i - s) mod n]; negative dynamic shifts misbehave)
                # and slice statically. Row-difference first so each rect
                # sum is 4 rolls + 2 subtractions.
                v1 = s1ref[:]

                def roll_to(v, off, size, axis):
                    return pltpu.roll(
                        v, jnp.where(off > 0, size - off, 0), axis)

                def rect_dyn(x0, y0, rw, rh):
                    rd = (roll_to(v1, y0 + rh, sh, 0)
                          - roll_to(v1, y0, sh, 0))
                    out = (roll_to(rd, x0 + rw, canvas_w, 1)
                           - roll_to(rd, x0, canvas_w, 1))
                    return out[0:band_h, 0:nx]

                zgrid = jnp.zeros((band_h, nx), jnp.float32)

                def feature(tr, n):
                    # rects 0/1 always exist; rect 2 is rare — predicate
                    # its 4 rolls on the weight (scalar cond, ~1/3 fewer
                    # rolls on 2-rect features)
                    f = None
                    for r in range(2):
                        p = geo_s[tr, n, r]
                        x0 = p & 31
                        y0 = (p >> 5) & 31
                        rw = (p >> 10) & 31
                        rh = (p >> 15) & 31
                        g = rect_dyn(x0, y0, rw, rh) * wts_s[tr, n, r]
                        f = g if f is None else f + g

                    def rect2():
                        p = geo_s[tr, n, 2]
                        return rect_dyn(p & 31, (p >> 5) & 31,
                                        (p >> 10) & 31,
                                        (p >> 15) & 31) * wts_s[tr, n, 2]

                    f = f + jax.lax.cond(wts_s[tr, n, 2] != 0.0, rect2,
                                         lambda: zgrid)
                    return f * inv_area

                def tree_body(tr, carry):
                    total, alive_f = carry
                    f0 = feature(tr, 0)
                    # stumps (both node-0 children are leaves) skip node 1
                    # entirely — most early-stage trees
                    f1 = jax.lax.cond(
                        flg_s[tr, 0] + flg_s[tr, 1] < 2.0,
                        lambda: feature(tr, 1), lambda: zgrid)
                    n1 = jnp.where(f1 < thr_s[tr, 1] * nf,
                                   leaf_s[tr, 2], leaf_s[tr, 3])
                    lv = flg_s[tr, 0] * leaf_s[tr, 0] \
                        + (1.0 - flg_s[tr, 0]) * n1
                    rv = flg_s[tr, 1] * leaf_s[tr, 1] \
                        + (1.0 - flg_s[tr, 1]) * n1
                    total = total + jnp.where(f0 < thr_s[tr, 0] * nf,
                                              lv, rv)
                    # stage boundary: fold the stage verdict into alive
                    # and reset the running total (scalar last flag)
                    last = last_s[tr]
                    passed = jnp.where(total >= sthr_s[tr], 1.0, 0.0)
                    alive_f = jnp.where(last > 0, alive_f * passed,
                                        alive_f)
                    total = total * (1.0 - last)
                    return total, alive_f

                alive0 = (valid_ref[:] != 0).astype(jnp.float32)
                zero = jnp.zeros((band_h, nx), jnp.float32)
                _, alive_f = jax.lax.fori_loop(0, n_trees, tree_body,
                                               (zero, alive0))
                out_ref[0] = (alive_f > 0).astype(jnp.int8)

            pl.run_scoped(
                body,
                pltpu.VMEM((sh, canvas_w), jnp.float32),
                pltpu.VMEM((sh, canvas_w), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)))

        smem = pltpu.SMEM
        call = pl.pallas_call(
            kernel,
            grid=(t, nbands),
            in_specs=[
                pl.BlockSpec(memory_space=smem),   # packed geo (N, 2, 3) i32
                pl.BlockSpec(memory_space=smem),   # wts (N, 2, 3) f32
                pl.BlockSpec(memory_space=smem),   # thr (N, 2) f32
                pl.BlockSpec(memory_space=smem),   # leaf (N, 4) f32
                pl.BlockSpec(memory_space=smem),   # flg (N, 2) f32
                pl.BlockSpec(memory_space=smem),   # is_last (N,) f32
                pl.BlockSpec(memory_space=smem),   # stage_thr (N,) f32
                pl.BlockSpec((band_h, nx), lambda fi, b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, band_h, nx),
                                   lambda fi, b: (fi, b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t, nbands * band_h, nx),
                                           jnp.int8),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=self._pallas_interpret,
        )
        geo_j = jnp.asarray(geo)
        wts_j = jnp.asarray(wts)
        thr_j = jnp.asarray(thr)
        leaf_j = jnp.asarray(leaf)
        flg_j = jnp.asarray(flg)
        last_j = jnp.asarray(is_last)
        sthr_j = jnp.asarray(sthr)

        return lambda ii, ii2: call(geo_j, wts_j, thr_j, leaf_j, flg_j,
                                    last_j, sthr_j, valid_pad, ii, ii2)

    # -- deep stages: host early-exit evaluator over survivors -----------

    def _host_deep(self):
        """(gray_f64, xs, ys, need_levels, levels, np_mats, canvas_h, w) ->
        pass mask for stages [early_stages, end) over survivor windows in
        canvas coordinates. The C++ path (native/haarcascade.cpp
        gifgan_haar_eval_pyramid) resamples the needed pyramid levels with
        the same triangle kernel as the device program and early-exits per
        window (~30 features average); the numpy fallback rebuilds the
        canvas by matmul. (A device gather formulation was measured at
        1.2 s per 4096-window bucket — TPU gathers — and removed.)"""
        if self._deep_eval is not None:
            return self._deep_eval
        try:
            from gifgan_tpu.track.haar import make_native_cascade_handle

            lib, handle, keep = make_native_cascade_handle(self.cas)
            if not hasattr(lib, "gifgan_haar_eval_pyramid"):
                lib.gifgan_haar_free(handle)
                raise RuntimeError("native lib too old; rebuild")
            self._native = (lib, handle, keep)

            def ev(g64, xs, ys, need, levels, np_mats, canvas_h, w):
                lh = np.asarray([levels[li].h for li in need], np.int32)
                lw = np.asarray([levels[li].w for li in need], np.int32)
                lrow = np.asarray([levels[li].row for li in need], np.int32)
                out = np.zeros(len(xs), np.uint8)
                lib.gifgan_haar_eval_pyramid(
                    handle, np.ascontiguousarray(g64, np.float64),
                    g64.shape[0], g64.shape[1], lh, lw, lrow, len(need),
                    int(canvas_h), np.ascontiguousarray(xs, np.int32),
                    np.ascontiguousarray(ys, np.int32), len(xs),
                    int(self.early_stages), out)
                return out.astype(bool)
        except RuntimeError:
            def ev(g64, xs, ys, need, levels, np_mats, canvas_h, w):
                canvas = np.zeros((canvas_h, w), np.float64)
                for li in need:
                    lv = levels[li]
                    mh, mw = np_mats[li]
                    canvas[lv.row:lv.row + lv.h, :lv.w] = mh @ g64 @ mw.T
                ii, ii2 = integral_images(canvas)
                return _eval_stages(
                    self.cas, ii, ii2, np.asarray(xs, np.int64),
                    np.asarray(ys, np.int64), 1.0, self.early_stages,
                    len(self.cas.stage_thr), self.rects0)
        self._deep_eval = ev
        return ev

    def __del__(self):
        native = getattr(self, "_native", None)
        if native:
            lib, handle, _ = native
            try:
                lib.gifgan_haar_free(handle)
            except Exception:
                pass
            self._native = None

    # -- public API ------------------------------------------------------

    def detect_batch(self, grays: np.ndarray) -> List[np.ndarray]:
        """grays: (T, H, W) float in [0, 255]. Returns T (M, 4) x,y,w,h
        arrays in original image coordinates."""
        import jax.numpy as jnp

        t, h, w = grays.shape
        if h * w * 255.0 > 2 ** 24:   # f32 integral-image precision bound
            from gifgan_tpu.track.haar import HaarDetector
            det = HaarDetector.__new__(HaarDetector)
            det.__dict__.update(self.__dict__)
            return [det.detect_rects(g) for g in grays]
        key = (t, h, w)
        if key not in self._progs:
            self._progs[key] = self._build_program(t, h, w)
        prog = self._progs[key]
        if prog is None:
            return [np.zeros((0, 4), np.int32) for _ in range(t)]
        fn, levels, ny, nx, valid, level_id, np_mats, canvas_h = prog

        rounded = np.clip(np.rint(grays), 0, 255).astype(np.uint8)
        packed = np.asarray(fn(jnp.asarray(rounded)))
        flat = np.unpackbits(packed)[:t * ny * nx]
        idx = np.flatnonzero(flat)
        fi, rem = np.divmod(idx, ny * nx)              # flat -> (T, ny, nx)
        gy, gx = np.divmod(rem, nx)
        candidates: List[List[tuple]] = [[] for _ in range(t)]
        if len(fi):
            st = self.stride
            cas = self.cas
            deep = self._host_deep()
            lids = level_id[gy, gx]
            # one finisher call per frame covers every scale: the canvas
            # mirrors the device row layout (level k's image at rows
            # lv.row..lv.row+lv.h) so rect sums stay block-local; only
            # the levels THIS frame's survivors touch get resampled
            for fr in np.unique(fi):
                sel = fi == fr
                ok = deep(rounded[fr].astype(np.float64), gx[sel] * st,
                          gy[sel] * st, np.unique(lids[sel]), levels,
                          np_mats, canvas_h, w)
                for gyi, gxi in zip(gy[sel][ok], gx[sel][ok]):
                    lv = levels[level_id[gyi, gxi]]
                    lx = gxi * st
                    ly = gyi * st - lv.row
                    candidates[fr].append((
                        int(round(lx * lv.scale)), int(round(ly * lv.scale)),
                        int(round(cas.window_w * lv.scale)),
                        int(round(cas.window_h * lv.scale))))
        return [group_rectangles(np.asarray(c, np.int64).reshape(-1, 4),
                                 self.min_neighbors) for c in candidates]

    def detect_rects(self, gray: np.ndarray) -> np.ndarray:
        return self.detect_batch(np.asarray(gray)[None])[0]

    def detect_clips(self, clips: List[np.ndarray], pad_multiple: int = 32,
                     frame_bucket: int = 32) -> List[List[np.ndarray]]:
        """N clips in ONE device program (round-2 verdict item 6).

        Per-dispatch costs dominate the device backend on small clips
        (~157 ms program + ~45 ms packed fetch per clip regardless of
        size — TODO.md round-3 measurements), so on the realistic
        ~100-200px distribution the per-clip path lost to host C++. This
        amortizes them: every clip is letterbox-padded (bottom/right, black)
        onto a common canvas, the frames of ALL clips stack on the batch
        axis, and one dispatch evaluates everything. Canvas dims round up
        to `pad_multiple` and the frame count to `frame_bucket` so repeat
        calls with similar workloads reuse one compiled program.

        clips: list of (T_i, H_i, W_i) float [0, 255] grayscale stacks.
        Returns, per clip, T_i arrays of (M, 4) x,y,w,h rects — windows
        extending into the padding are dropped (they straddle content and
        black border). Detections are detectMultiScale-equivalent on the
        padded canvas: scale planning follows the canvas size, so rects are
        statistically (not bit-) identical to per-clip detect_batch — same
        contract as the device-vs-host parity (tests/test_haar_device.py).
        """
        if not clips:
            return []
        clips = [np.asarray(c) for c in clips]
        rnd = lambda v, m: -(-int(v) // m) * m
        ch = rnd(max(c.shape[1] for c in clips), pad_multiple)
        cw = rnd(max(c.shape[2] for c in clips), pad_multiple)
        total = sum(c.shape[0] for c in clips)
        fb = rnd(total, frame_bucket)
        stack = np.zeros((fb, ch, cw), np.float64)
        row = 0
        for c in clips:
            stack[row:row + c.shape[0], :c.shape[1], :c.shape[2]] = c
            row += c.shape[0]
        per_frame = self.detect_batch(stack)
        out: List[List[np.ndarray]] = []
        row = 0
        for c in clips:
            t_i, h_i, w_i = c.shape
            frames = []
            for rects in per_frame[row:row + t_i]:
                if len(rects):
                    keep = ((rects[:, 0] >= 0) & (rects[:, 1] >= 0)
                            & (rects[:, 0] + rects[:, 2] <= w_i)
                            & (rects[:, 1] + rects[:, 3] <= h_i))
                    rects = rects[keep]
                frames.append(rects)
            out.append(frames)
            row += t_i
        return out

    def detect_video(self, frames_rgb: np.ndarray):
        from gifgan_tpu.track.boxes import Detection

        grays = (np.dot(frames_rgb[..., :3].astype(np.float64),
                        [0.299, 0.587, 0.114])
                 if frames_rgb.ndim == 4 else frames_rgb.astype(np.float64))
        rect_lists = self.detect_batch(grays)
        return [[Detection.from_rect(r, i) for r in rects]
                for i, rects in enumerate(rect_lists)]

    def __call__(self, frame: np.ndarray, frame_number: int = 0):
        from gifgan_tpu.track.boxes import Detection

        gray = (np.dot(frame[..., :3].astype(np.float64),
                       [0.299, 0.587, 0.114])
                if frame.ndim == 3 and frame.shape[-1] >= 3
                else frame.astype(np.float64))
        rects = self.detect_rects(gray)
        return [Detection.from_rect(r, frame_number) for r in rects]
