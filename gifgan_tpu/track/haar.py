"""Haar-cascade face detection, implemented natively (JAX + numpy).

This image's OpenCV build ships without objdetect (no CascadeClassifier), so
the detector the reference leans on (track_faces.py:243,260-262;
facedetect.py:164) is rebuilt here from the cascade *format*:

  - Parses standard OpenCV new-format cascade XML (opencv-cascade-classifier,
    BOOST stages of depth-2 trees over HAAR rect features). The trained
    cascade file is user-supplied model data (e.g. OpenCV's
    haarcascade_frontalface_alt2.xml) — pass its path in; nothing is bundled.
  - Integral + squared-integral images via cumsum (device-friendly).
  - Multi-scale sliding windows: rects are scaled per pyramid level (with
    OpenCV's first-rect weight re-balancing), features evaluated on the
    variance-normalized window: pass iff sum of tree leaf values >= stage
    threshold for all stages.
  - TPU-shaped evaluation: windows are evaluated as one vectorized batch per
    scale with a two-phase schedule — ALL windows through the first (cheap)
    stages, then the tiny surviving set through the deep stages — instead of
    OpenCV's per-window early-exit branch loop, which doesn't vectorize.
  - minNeighbors grouping by rectangle-similarity clustering (matching
    cv2.groupRectangles semantics: eps-relative box closeness, keep clusters
    with > minNeighbors-1 members, average their boxes).

Bit-exactness with OpenCV is not a goal (OpenCV's rounding isn't specified);
track-rate-level statistical parity is (SURVEY.md §7.3).
"""

from __future__ import annotations

import math
import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class HaarCascade:
    window_w: int
    window_h: int
    # features: (F, 3, 5) [x, y, w, h, weight]; unused rects zero-weight
    rects: np.ndarray
    n_rects: np.ndarray          # (F,)
    # trees: exactly 2 nodes each (padded), 3 leaves
    node_feat: np.ndarray        # (T, 2) feature index per node
    node_thr: np.ndarray         # (T, 2)
    node_left: np.ndarray        # (T, 2) child code: >0 internal idx, <=0 leaf -v
    node_right: np.ndarray       # (T, 2)
    leaves: np.ndarray           # (T, 4) leaf values (padded)
    stage_first: np.ndarray      # (S,)
    stage_count: np.ndarray      # (S,)
    stage_thr: np.ndarray        # (S,)


def parse_cascade(xml_path: str) -> HaarCascade:
    root = ET.parse(xml_path).getroot()
    cas = root.find("cascade")
    assert cas is not None, "not an opencv-cascade-classifier file"
    assert cas.findtext("featureType").strip() == "HAAR"
    w = int(cas.findtext("width"))
    h = int(cas.findtext("height"))

    feats = []
    for f in cas.find("features"):
        rects = []
        for r in f.find("rects"):
            vals = [float(v) for v in r.text.split()]
            rects.append(vals)  # x y w h weight
        while len(rects) < 3:
            rects.append([0, 0, 0, 0, 0.0])
        feats.append(rects[:3])
    rects = np.asarray(feats, np.float64)  # (F, 3, 5)
    n_rects = (rects[:, :, 4] != 0).sum(axis=1).astype(np.int32)

    node_feat, node_thr, node_left, node_right, leaves = [], [], [], [], []
    stage_first, stage_count, stage_thr = [], [], []
    for stage in cas.find("stages"):
        stage_thr.append(float(stage.findtext("stageThreshold")))
        stage_first.append(len(node_feat))
        count = 0
        for wc in stage.find("weakClassifiers"):
            ints = wc.findtext("internalNodes").split()
            lvs = [float(v) for v in wc.findtext("leafValues").split()]
            nodes = [ints[i:i + 4] for i in range(0, len(ints), 4)]
            assert len(nodes) <= 2, "only depth-2 trees supported"
            nf, nt, nl, nr = [0, 0], [np.inf, np.inf], [0, 0], [0, 0]
            for i, (l, r, fi, th) in enumerate(nodes):
                nl[i], nr[i] = int(l), int(r)
                nf[i], nt[i] = int(fi), float(th)
            if len(nodes) == 1:
                # pad: node1 never reached (children of node0 are leaves)
                nf[1], nt[1] = 0, np.inf
            while len(lvs) < 4:
                lvs.append(0.0)
            node_feat.append(nf)
            node_thr.append(nt)
            node_left.append(nl)
            node_right.append(nr)
            leaves.append(lvs[:4])
            count += 1
        stage_count.append(count)

    return HaarCascade(
        window_w=w, window_h=h,
        rects=rects, n_rects=n_rects,
        node_feat=np.asarray(node_feat, np.int32),
        node_thr=np.asarray(node_thr, np.float64),
        node_left=np.asarray(node_left, np.int32),
        node_right=np.asarray(node_right, np.int32),
        leaves=np.asarray(leaves, np.float64),
        stage_first=np.asarray(stage_first, np.int32),
        stage_count=np.asarray(stage_count, np.int32),
        stage_thr=np.asarray(stage_thr, np.float64),
    )


def integral_images(gray: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Zero-padded integral and squared-integral images, (H+1, W+1)."""
    g = gray.astype(np.float64)
    ii = np.zeros((g.shape[0] + 1, g.shape[1] + 1), np.float64)
    ii[1:, 1:] = g.cumsum(0).cumsum(1)
    ii2 = np.zeros_like(ii)
    ii2[1:, 1:] = (g * g).cumsum(0).cumsum(1)
    return ii, ii2


def _scaled_rects(cas: HaarCascade, scale: float):
    """Scale+round feature rects to a pyramid level, rebalancing the first
    rect's weight so weighted areas still cancel (OpenCV behavior)."""
    r = cas.rects
    sr = np.empty_like(r)
    sr[:, :, 0] = np.round(r[:, :, 0] * scale)
    sr[:, :, 1] = np.round(r[:, :, 1] * scale)
    sr[:, :, 2] = np.round(r[:, :, 2] * scale)
    sr[:, :, 3] = np.round(r[:, :, 3] * scale)
    sr[:, :, 4] = r[:, :, 4]
    area = sr[:, :, 2] * sr[:, :, 3]
    # weight0 = -sum_{i>0} w_i*area_i / area_0
    rest = (sr[:, 1:, 4] * area[:, 1:]).sum(axis=1)
    a0 = np.where(area[:, 0] > 0, area[:, 0], 1.0)
    sr[:, 0, 4] = -rest / a0
    return sr


def _rect_sums(ii: np.ndarray, xs: np.ndarray, ys: np.ndarray,
               rects: np.ndarray) -> np.ndarray:
    """Feature values for windows at (xs, ys): (W,) x (F, 3, 5) -> (W, F)."""
    rx = rects[None, :, :, 0].astype(np.int64)
    ry = rects[None, :, :, 1].astype(np.int64)
    rw = rects[None, :, :, 2].astype(np.int64)
    rh = rects[None, :, :, 3].astype(np.int64)
    wt = rects[None, :, :, 4]
    x1 = xs[:, None, None] + rx
    y1 = ys[:, None, None] + ry
    x2 = x1 + rw
    y2 = y1 + rh
    s = (ii[y1, x1] + ii[y2, x2] - ii[y1, x2] - ii[y2, x1])
    return (s * wt).sum(axis=2)


def _eval_stages(cas: HaarCascade, ii, ii2, xs, ys, scale: float,
                 stage_lo: int, stage_hi: int,
                 rects_scaled: np.ndarray) -> np.ndarray:
    """Evaluate stages [lo, hi) for windows at (xs, ys); returns pass mask."""
    ww = int(round(cas.window_w * scale))
    wh = int(round(cas.window_h * scale))
    inv_area = 1.0 / (ww * wh)
    s1 = (ii[ys, xs] + ii[ys + wh, xs + ww]
          - ii[ys, xs + ww] - ii[ys + wh, xs])
    s2 = (ii2[ys, xs] + ii2[ys + wh, xs + ww]
          - ii2[ys, xs + ww] - ii2[ys + wh, xs])
    mean = s1 * inv_area
    var = s2 * inv_area - mean * mean
    nf = np.where(var > 0, np.sqrt(np.maximum(var, 0)), 1.0)

    t0 = cas.stage_first[stage_lo]
    t1 = cas.stage_first[stage_hi - 1] + cas.stage_count[stage_hi - 1]
    feats_needed = np.unique(cas.node_feat[t0:t1].ravel())
    fmap = np.full(cas.rects.shape[0], -1, np.int64)
    fmap[feats_needed] = np.arange(len(feats_needed))
    fvals = _rect_sums(ii, xs, ys, rects_scaled[feats_needed])  # (W, Fsub)
    fvals = fvals * inv_area

    alive = np.ones(len(xs), bool)
    for s in range(stage_lo, stage_hi):
        a, b = cas.stage_first[s], cas.stage_first[s] + cas.stage_count[s]
        total = np.zeros(len(xs))
        for t in range(a, b):
            f0 = fvals[:, fmap[cas.node_feat[t, 0]]]
            go_left0 = f0 < cas.node_thr[t, 0] * nf
            child = np.where(go_left0, cas.node_left[t, 0],
                             cas.node_right[t, 0])
            # child > 0 -> internal node 1; <= 0 -> leaf -child
            f1 = fvals[:, fmap[cas.node_feat[t, 1]]]
            go_left1 = f1 < cas.node_thr[t, 1] * nf
            leaf_from_n1 = np.where(go_left1, -cas.node_left[t, 1],
                                    -cas.node_right[t, 1])
            leaf_idx = np.where(child <= 0, -child, leaf_from_n1)
            total += cas.leaves[t][leaf_idx]
        alive &= total >= cas.stage_thr[s]
        if not alive.any():
            break
    return alive


def group_rectangles(boxes: np.ndarray, min_neighbors: int,
                     eps: float = 0.2) -> np.ndarray:
    """cv2.groupRectangles semantics: boxes (N, 4) as x,y,w,h; cluster boxes
    whose edges are within eps-relative distance, keep clusters with
    STRICTLY MORE than min_neighbors members (OpenCV eliminates clusters
    "smaller or equal to groupThreshold"), return averaged boxes.
    min_neighbors=0 returns the boxes ungrouped (cv2 behavior)."""
    n = len(boxes)
    if n == 0:
        return np.zeros((0, 4), np.int32)
    if min_neighbors <= 0:
        return np.asarray(boxes, np.int32).reshape(-1, 4)
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    b = boxes.astype(np.float64)
    for i in range(n):
        for j in range(i + 1, n):
            delta = eps * (min(b[i, 2], b[j, 2]) + min(b[i, 3], b[j, 3])) * 0.5
            if (abs(b[i, 0] - b[j, 0]) <= delta
                    and abs(b[i, 1] - b[j, 1]) <= delta
                    and abs(b[i, 0] + b[i, 2] - b[j, 0] - b[j, 2]) <= delta
                    and abs(b[i, 1] + b[i, 3] - b[j, 1] - b[j, 3]) <= delta):
                pi, pj = find(i), find(j)
                if pi != pj:
                    parent[pj] = pi
    roots = np.array([find(i) for i in range(n)])
    out = []
    for root in np.unique(roots):
        members = b[roots == root]
        if len(members) > min_neighbors:
            out.append(np.round(members.mean(axis=0)))
    return np.asarray(out, np.int32).reshape(-1, 4)


class HaarDetector:
    """Drop-in face detector with detectMultiScale-like parameters, backed by
    the native cascade evaluator. Returns gifgan Detections."""

    def __init__(self, cascade_path: str, scale_factor: float = 1.1,
                 min_neighbors: int = 3, min_size: int = 20,
                 max_size_factor: float = 1.0,
                 early_stages: int = 6):
        if scale_factor <= 1.0:
            raise ValueError(
                f"scale_factor must be > 1.0, got {scale_factor} "
                "(the scale loop multiplies by it until the window "
                "outgrows the image; <= 1.0 never terminates)")
        self.cas = parse_cascade(cascade_path)
        self.scale_factor = scale_factor
        self.min_neighbors = min_neighbors
        self.min_size = min_size
        self.max_size_factor = max_size_factor
        self.early_stages = min(early_stages, len(self.cas.stage_thr))

    def detect_rects(self, gray: np.ndarray) -> np.ndarray:
        cas = self.cas
        h, w = gray.shape[:2]
        side = math.sqrt(h * w)
        max_len = side * self.max_size_factor
        ii, ii2 = integral_images(gray)

        candidates = []
        scale = max(self.min_size / cas.window_w, 1.0)
        while True:
            ww = int(round(cas.window_w * scale))
            wh = int(round(cas.window_h * scale))
            if ww > min(w, max_len) or wh > min(h, max_len):
                break
            stride = max(2, int(round(scale)))
            rs = _scaled_rects(cas, scale)
            # rounding can push a scaled rect a pixel past the nominal
            # window; bound origins by the true max extent so integral
            # lookups stay in range while still scanning the last window
            ext_x = int(max(ww, (rs[:, :, 0] + rs[:, :, 2]).max()))
            ext_y = int(max(wh, (rs[:, :, 1] + rs[:, :, 3]).max()))
            xs0 = np.arange(0, w - ext_x + 1, stride)
            ys0 = np.arange(0, h - ext_y + 1, stride)
            gx, gy = np.meshgrid(xs0, ys0)
            xs, ys = gx.ravel(), gy.ravel()
            if len(xs):
                alive = _eval_stages(cas, ii, ii2, xs, ys, scale, 0,
                                     self.early_stages, rs)
                if alive.any():
                    xs2, ys2 = xs[alive], ys[alive]
                    alive2 = _eval_stages(cas, ii, ii2, xs2, ys2, scale,
                                          self.early_stages,
                                          len(cas.stage_thr), rs)
                    for x, y in zip(xs2[alive2], ys2[alive2]):
                        candidates.append((x, y, ww, wh))
            scale *= self.scale_factor
        return group_rectangles(np.asarray(candidates, np.int64)
                                .reshape(-1, 4), self.min_neighbors)

    def __call__(self, frame: np.ndarray, frame_number: int = 0):
        from gifgan_tpu.track.boxes import Detection

        gray = (np.dot(frame[..., :3].astype(np.float64),
                       [0.299, 0.587, 0.114])
                if frame.ndim == 3 and frame.shape[-1] >= 3
                else frame.astype(np.float64))
        rects = self.detect_rects(gray)
        return [Detection.from_rect(r, frame_number) for r in rects]


# ---------------------------------------------------------------------------
# JAX-accelerated evaluation: the early (cheap) stages for ALL windows run as
# one vectorized device program — features gathered from the integral image
# in bulk, every tree evaluated in parallel, per-stage sums via one matmul
# with a stage-indicator matrix — then the tiny surviving set goes through
# the deep stages on host. Window counts are padded to power-of-two buckets
# so each (bucket, scale) pair compiles once.
# ---------------------------------------------------------------------------

class JaxStageEvaluator:
    def __init__(self, cas: HaarCascade, stage_hi: int):
        import jax
        import jax.numpy as jnp

        self.cas = cas
        self.stage_hi = stage_hi
        t1 = cas.stage_first[stage_hi - 1] + cas.stage_count[stage_hi - 1]
        self.n_trees = int(t1)
        feats = np.unique(cas.node_feat[:t1].ravel())
        self.feats = feats
        fmap = np.full(cas.rects.shape[0], -1, np.int64)
        fmap[feats] = np.arange(len(feats))
        self.local_feat = jnp.asarray(fmap[cas.node_feat[:t1]])  # (T, 2)
        self.node_thr = jnp.asarray(cas.node_thr[:t1], jnp.float32)
        self.node_left = jnp.asarray(cas.node_left[:t1])
        self.node_right = jnp.asarray(cas.node_right[:t1])
        self.leaves = jnp.asarray(cas.leaves[:t1], jnp.float32)
        # stage indicator (T, S) and thresholds
        ind = np.zeros((self.n_trees, stage_hi), np.float32)
        for s in range(stage_hi):
            a = cas.stage_first[s]
            ind[a:a + cas.stage_count[s], s] = 1.0
        self.stage_ind = jnp.asarray(ind)
        self.stage_thr = jnp.asarray(cas.stage_thr[:stage_hi], jnp.float32)
        self._jit_cache = {}

    def _build(self, scale: float):
        import functools

        import jax
        import jax.numpy as jnp

        cas = self.cas
        rs = _scaled_rects(cas, scale)[self.feats]  # (Fsub, 3, 5)
        rx = jnp.asarray(rs[:, :, 0], jnp.int32)
        ry = jnp.asarray(rs[:, :, 1], jnp.int32)
        rw = jnp.asarray(rs[:, :, 2], jnp.int32)
        rh = jnp.asarray(rs[:, :, 3], jnp.int32)
        wt = jnp.asarray(rs[:, :, 4], jnp.float32)
        ww = int(round(cas.window_w * scale))
        wh = int(round(cas.window_h * scale))
        inv_area = 1.0 / (ww * wh)

        lf, thr = self.local_feat, self.node_thr
        nl, nr, leaves = self.node_left, self.node_right, self.leaves
        stage_ind, stage_thr = self.stage_ind, self.stage_thr

        @jax.jit
        def evaluate(ii, ii2, xs, ys, valid):
            # window normalization factor
            s1 = (ii[ys, xs] + ii[ys + wh, xs + ww]
                  - ii[ys, xs + ww] - ii[ys + wh, xs])
            s2 = (ii2[ys, xs] + ii2[ys + wh, xs + ww]
                  - ii2[ys, xs + ww] - ii2[ys + wh, xs])
            mean = s1 * inv_area
            var = s2 * inv_area - mean * mean
            nf = jnp.where(var > 0, jnp.sqrt(jnp.maximum(var, 0.0)), 1.0)

            # feature values: (W, Fsub)
            x1 = xs[:, None, None] + rx
            y1 = ys[:, None, None] + ry
            x2, y2 = x1 + rw, y1 + rh
            sums = ii[y1, x1] + ii[y2, x2] - ii[y1, x2] - ii[y2, x1]
            fvals = (sums * wt).sum(axis=2) * inv_area   # (W, Fsub)

            f0 = fvals[:, lf[:, 0]]                      # (W, T)
            f1 = fvals[:, lf[:, 1]]
            nfc = nf[:, None]
            child = jnp.where(f0 < thr[None, :, 0] * nfc, nl[None, :, 0],
                              nr[None, :, 0])
            leaf_n1 = jnp.where(f1 < thr[None, :, 1] * nfc, -nl[None, :, 1],
                                -nr[None, :, 1])
            leaf_idx = jnp.where(child <= 0, -child, leaf_n1)  # (W, T)
            vals = jnp.take_along_axis(
                jnp.broadcast_to(leaves[None], (xs.shape[0],) + leaves.shape),
                leaf_idx[:, :, None], axis=2)[:, :, 0]
            stage_sums = vals @ stage_ind                # (W, S)
            alive = jnp.all(stage_sums >= stage_thr[None, :], axis=1)
            return alive & valid

        return evaluate

    def __call__(self, ii, ii2, xs: np.ndarray, ys: np.ndarray,
                 scale: float) -> np.ndarray:
        import jax.numpy as jnp

        n = len(xs)
        bucket = 1 << max(6, (n - 1).bit_length())
        key = (scale, bucket)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build(scale)
        xs_p = np.zeros(bucket, np.int32)
        ys_p = np.zeros(bucket, np.int32)
        xs_p[:n], ys_p[:n] = xs, ys
        valid = np.zeros(bucket, bool)
        valid[:n] = True
        alive = self._jit_cache[key](jnp.asarray(ii, jnp.float32),
                                     jnp.asarray(ii2, jnp.float32),
                                     jnp.asarray(xs_p), jnp.asarray(ys_p),
                                     jnp.asarray(valid))
        return np.asarray(alive)[:n]


class JaxHaarDetector(HaarDetector):
    """HaarDetector with the early stages evaluated on-device (JAX) for all
    windows at once; survivors finish on host. Same detections as the numpy
    path (float32 vs float64 rounding aside)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._jax_eval = JaxStageEvaluator(self.cas, self.early_stages)

    def detect_rects(self, gray: np.ndarray) -> np.ndarray:
        cas = self.cas
        h, w = gray.shape[:2]
        # float32 integral images lose rect-sum precision once values pass
        # 2^24 (~360x360 of 255s): fall back to the float64 numpy path.
        if h * w * 255.0 > 2 ** 24:
            return super().detect_rects(gray)
        side = math.sqrt(h * w)
        max_len = side * self.max_size_factor
        ii, ii2 = integral_images(gray)

        candidates = []
        scale = max(self.min_size / cas.window_w, 1.0)
        while True:
            ww = int(round(cas.window_w * scale))
            wh = int(round(cas.window_h * scale))
            if ww > min(w, max_len) or wh > min(h, max_len):
                break
            stride = max(2, int(round(scale)))
            rs_b = _scaled_rects(cas, scale)
            ext_x = int(max(ww, (rs_b[:, :, 0] + rs_b[:, :, 2]).max()))
            ext_y = int(max(wh, (rs_b[:, :, 1] + rs_b[:, :, 3]).max()))
            xs0 = np.arange(0, w - ext_x + 1, stride)
            ys0 = np.arange(0, h - ext_y + 1, stride)
            gx, gy = np.meshgrid(xs0, ys0)
            xs, ys = gx.ravel().astype(np.int32), gy.ravel().astype(np.int32)
            if len(xs):
                alive = self._jax_eval(ii, ii2, xs, ys, scale)
                if alive.any():
                    xs2, ys2 = xs[alive], ys[alive]
                    rs = _scaled_rects(cas, scale)
                    alive2 = _eval_stages(cas, ii, ii2, xs2, ys2, scale,
                                          self.early_stages,
                                          len(cas.stage_thr), rs)
                    for x, y in zip(xs2[alive2], ys2[alive2]):
                        candidates.append((x, y, ww, wh))
            scale *= self.scale_factor
        return group_rectangles(np.asarray(candidates, np.int64)
                                .reshape(-1, 4), self.min_neighbors)


class BatchedJaxHaarDetector(JaxHaarDetector):
    """Video-rate detection: evaluates the early stages for ALL FRAMES of a
    clip in one device program per scale (frames share the window grid, the
    integral images batch, and the weight tensors are reused), then finishes
    survivors per frame on host. Exposes `detect_batch`; single-frame calls
    fall back to the parent."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._batch_cache = {}

    def _batched_eval(self, scale: float, n_windows_bucket: int):
        import jax

        key = (scale, n_windows_bucket)
        if key not in self._batch_cache:
            single = self._jax_eval._build(scale)
            self._batch_cache[key] = jax.jit(jax.vmap(
                single, in_axes=(0, 0, None, None, None)))
        return self._batch_cache[key]

    def detect_batch(self, grays: np.ndarray):
        """grays: (T, H, W) float. Returns a list of T (M_t, 4) rect arrays."""
        import jax.numpy as jnp

        cas = self.cas
        t, h, w = grays.shape
        if h * w * 255.0 > 2 ** 24:   # f32 precision limit: per-frame f64 path
            return [super(JaxHaarDetector, self).detect_rects(g)
                    for g in grays]
        side = math.sqrt(h * w)
        max_len = side * self.max_size_factor

        iis = np.zeros((t, h + 1, w + 1), np.float32)
        ii2s = np.zeros((t, h + 1, w + 1), np.float32)
        for i, g in enumerate(grays):
            a, b = integral_images(g)
            iis[i], ii2s[i] = a, b
        iis_j = jnp.asarray(iis)
        ii2s_j = jnp.asarray(ii2s)

        candidates = [[] for _ in range(t)]
        scale = max(self.min_size / cas.window_w, 1.0)
        while True:
            ww = int(round(cas.window_w * scale))
            wh = int(round(cas.window_h * scale))
            if ww > min(w, max_len) or wh > min(h, max_len):
                break
            stride = max(2, int(round(scale)))
            rs = _scaled_rects(cas, scale)
            ext_x = int(max(ww, (rs[:, :, 0] + rs[:, :, 2]).max()))
            ext_y = int(max(wh, (rs[:, :, 1] + rs[:, :, 3]).max()))
            xs0 = np.arange(0, w - ext_x + 1, stride)
            ys0 = np.arange(0, h - ext_y + 1, stride)
            gx, gy = np.meshgrid(xs0, ys0)
            xs = gx.ravel().astype(np.int32)
            ys = gy.ravel().astype(np.int32)
            if len(xs):
                n = len(xs)
                bucket = 1 << max(6, (n - 1).bit_length())
                xs_p = np.zeros(bucket, np.int32)
                ys_p = np.zeros(bucket, np.int32)
                xs_p[:n], ys_p[:n] = xs, ys
                valid = np.zeros(bucket, bool)
                valid[:n] = True
                fn = self._batched_eval(scale, bucket)
                alive = np.asarray(fn(iis_j, ii2s_j, jnp.asarray(xs_p),
                                      jnp.asarray(ys_p),
                                      jnp.asarray(valid)))[:, :n]
                for fi in np.nonzero(alive.any(axis=1))[0]:
                    row = alive[fi]
                    xs2, ys2 = xs[row], ys[row]
                    ii, ii2 = integral_images(grays[fi])
                    deep = _eval_stages(cas, ii, ii2, xs2, ys2, scale,
                                        self.early_stages,
                                        len(cas.stage_thr), rs)
                    for x, y in zip(xs2[deep], ys2[deep]):
                        candidates[fi].append((x, y, ww, wh))
            scale *= self.scale_factor
        return [group_rectangles(np.asarray(c, np.int64).reshape(-1, 4),
                                 self.min_neighbors) for c in candidates]

    def detect_video(self, frames_rgb: np.ndarray):
        """frames (T, H, W, C) uint8 -> list of per-frame Detection lists."""
        from gifgan_tpu.track.boxes import Detection

        grays = np.dot(frames_rgb[..., :3].astype(np.float64),
                       [0.299, 0.587, 0.114])
        rect_lists = self.detect_batch(grays)
        return [[Detection.from_rect(r, i) for r in rects]
                for i, rects in enumerate(rect_lists)]


def make_native_cascade_handle(cas: HaarCascade):
    """(lib, handle, keepalive) for the C++ cascade evaluator
    (native/haarcascade.cpp). Caller must lib.gifgan_haar_free(handle) and
    hold `keepalive` (the arrays the C side reads) as long as the handle
    lives. Raises RuntimeError when the native library is unavailable."""
    import ctypes

    from gifgan_tpu.data.native_gif import _load

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (make -C native)")
    if not hasattr(lib, "gifgan_haar_create"):
        raise RuntimeError("native library too old; rebuild")
    lib.gifgan_haar_create.restype = ctypes.c_void_p
    lib.gifgan_haar_detect.restype = ctypes.c_int
    # without explicit argtypes ctypes passes the 64-bit handle as a
    # truncated C int — freeing a garbage pointer
    lib.gifgan_haar_free.argtypes = [ctypes.c_void_p]
    lib.gifgan_haar_free.restype = None
    c_int_p = np.ctypeslib.ndpointer(np.int32, flags="C")
    c_dbl_p = np.ctypeslib.ndpointer(np.float64, flags="C")
    lib.gifgan_haar_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, c_dbl_p,
        ctypes.c_int, c_int_p, c_dbl_p, c_int_p, c_int_p, c_dbl_p,
        ctypes.c_int, c_int_p, c_int_p, c_dbl_p]
    lib.gifgan_haar_detect.argtypes = [
        ctypes.c_void_p, c_dbl_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_int, ctypes.c_double, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C,WRITEABLE"),
        ctypes.c_int]
    if hasattr(lib, "gifgan_haar_eval_pyramid"):
        lib.gifgan_haar_eval_pyramid.restype = None
        lib.gifgan_haar_eval_pyramid.argtypes = [
            ctypes.c_void_p, c_dbl_p, ctypes.c_int, ctypes.c_int,
            c_int_p, c_int_p, c_int_p, ctypes.c_int, ctypes.c_int,
            c_int_p, c_int_p, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint8, flags="C,WRITEABLE")]
    # replace inf padding (unreached node 1) with a huge finite value
    thr = np.where(np.isfinite(cas.node_thr), cas.node_thr, 1e30)
    keepalive = (
        np.ascontiguousarray(cas.rects, np.float64),
        np.ascontiguousarray(cas.node_feat, np.int32),
        np.ascontiguousarray(thr, np.float64),
        np.ascontiguousarray(cas.node_left, np.int32),
        np.ascontiguousarray(cas.node_right, np.int32),
        np.ascontiguousarray(cas.leaves, np.float64),
        np.ascontiguousarray(cas.stage_first, np.int32),
        np.ascontiguousarray(cas.stage_count, np.int32),
        np.ascontiguousarray(cas.stage_thr, np.float64),
    )
    k = keepalive
    handle = lib.gifgan_haar_create(
        cas.window_w, cas.window_h, cas.rects.shape[0], k[0],
        len(cas.node_feat), k[1], k[2], k[3], k[4], k[5],
        len(cas.stage_thr), k[6], k[7], k[8])
    return lib, handle, keepalive


class NativeHaarDetector(HaarDetector):
    """C++ early-exit cascade evaluator (native/haarcascade.cpp) — the
    per-window branchy loop the CPU does best: windows die after the first
    failed stage instead of evaluating all trees. Same cascade arrays and
    rounding as the Python/JAX paths; cross-checked in tests."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._lib, self._handle, self._keepalive = \
            make_native_cascade_handle(self.cas)

    def __del__(self):
        handle = getattr(self, "_handle", None)
        lib = getattr(self, "_lib", None)
        if handle and lib is not None:
            try:
                lib.gifgan_haar_free(handle)
            except Exception:
                pass
            self._handle = None

    def detect_rects(self, gray: np.ndarray) -> np.ndarray:
        g = np.ascontiguousarray(gray, np.float64)
        out = np.zeros((256, 4), np.int32)
        n = self._lib.gifgan_haar_detect(
            self._handle, g, g.shape[0], g.shape[1],
            float(self.scale_factor), int(self.min_size),
            float(self.max_size_factor), int(self.min_neighbors),
            out.reshape(-1), 256)
        return out[:n].copy()
