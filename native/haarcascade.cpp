// gifgan_tpu native Haar-cascade evaluator.
//
// The branchy per-window early-exit loop is exactly what CPUs do well and
// vector ISAs don't: most windows die within the first couple of stages
// (~10 features) instead of evaluating all ~2k. This is the C++ hot loop
// behind gifgan_tpu.track.haar.NativeHaarDetector; the cascade model arrays
// are parsed from the standard OpenCV XML on the Python side and passed in
// flat (same data layout as the Python/JAX evaluators, so all three backends
// are cross-checkable).
//
// Build: make -C native  ->  libgifgan_native.so (shared with gifcodec.cpp)

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Cascade {
  int win_w, win_h;
  int n_feats;
  std::vector<double> rects;     // (F, 3, 5) x y w h weight
  int n_trees;
  std::vector<int> node_feat;    // (T, 2)
  std::vector<double> node_thr;  // (T, 2)
  std::vector<int> node_left;    // (T, 2)
  std::vector<int> node_right;   // (T, 2)
  std::vector<double> leaves;    // (T, 4)
  int n_stages;
  std::vector<int> stage_first;
  std::vector<int> stage_count;
  std::vector<double> stage_thr;
};

struct ScaledFeature {
  // up to 3 rects, precomputed integral-image offsets for a row stride
  int n;
  long off[3][4];   // offsets of the 4 integral corners per rect
  double weight[3];
};

inline double rect_sum(const double* ii, long base, const long* off) {
  return ii[base + off[0]] + ii[base + off[3]] - ii[base + off[1]] -
         ii[base + off[2]];
}

void group_rectangles(std::vector<int>& boxes, int min_neighbors,
                      double eps, std::vector<int>& out) {
  const int n = static_cast<int>(boxes.size() / 4);
  if (min_neighbors <= 0) {           // cv2: groupThreshold 0 = no grouping
    out = boxes;
    return;
  }
  std::vector<int> parent(n);
  for (int i = 0; i < n; ++i) parent[i] = i;
  std::vector<int>& p = parent;
  auto find = [&p](int i) {
    while (p[i] != i) { p[i] = p[p[i]]; i = p[i]; }
    return i;
  };
  for (int i = 0; i < n; ++i) {
    const int* a = &boxes[4 * i];
    for (int j = i + 1; j < n; ++j) {
      const int* b = &boxes[4 * j];
      double delta = eps * (std::min(a[2], b[2]) + std::min(a[3], b[3])) * 0.5;
      if (std::abs(a[0] - b[0]) <= delta && std::abs(a[1] - b[1]) <= delta &&
          std::abs(a[0] + a[2] - b[0] - b[2]) <= delta &&
          std::abs(a[1] + a[3] - b[1] - b[3]) <= delta) {
        int pi = find(i), pj = find(j);
        if (pi != pj) p[pj] = pi;
      }
    }
  }
  std::vector<int> count(n, 0);
  std::vector<double> acc(static_cast<size_t>(n) * 4, 0.0);
  for (int i = 0; i < n; ++i) {
    int r = find(i);
    ++count[r];
    for (int k = 0; k < 4; ++k) acc[4 * r + k] += boxes[4 * i + k];
  }
  for (int i = 0; i < n; ++i) {
    // cv2 eliminates clusters with size <= groupThreshold (strict >)
    if (p[i] == i && count[i] > min_neighbors) {
      for (int k = 0; k < 4; ++k)
        out.push_back(static_cast<int>(std::lround(acc[4 * i + k] / count[i])));
    }
  }
}

void resample_weights(int n_in, int n_out, std::vector<int>& start,
                      std::vector<double>& wts, int& n_taps);
void eval_windows_on_image(const Cascade& c, const double* gray, int h, int w,
                           const int* xs, const int* ys, int n, int stage_lo,
                           uint8_t* out_pass);

}  // namespace

extern "C" {

void* gifgan_haar_create(int win_w, int win_h, int n_feats,
                         const double* rects, int n_trees,
                         const int* node_feat, const double* node_thr,
                         const int* node_left, const int* node_right,
                         const double* leaves, int n_stages,
                         const int* stage_first, const int* stage_count,
                         const double* stage_thr) {
  auto* c = new Cascade();
  c->win_w = win_w;
  c->win_h = win_h;
  c->n_feats = n_feats;
  c->rects.assign(rects, rects + static_cast<size_t>(n_feats) * 15);
  c->n_trees = n_trees;
  c->node_feat.assign(node_feat, node_feat + 2 * n_trees);
  c->node_thr.assign(node_thr, node_thr + 2 * n_trees);
  c->node_left.assign(node_left, node_left + 2 * n_trees);
  c->node_right.assign(node_right, node_right + 2 * n_trees);
  c->leaves.assign(leaves, leaves + 4 * n_trees);
  c->n_stages = n_stages;
  c->stage_first.assign(stage_first, stage_first + n_stages);
  c->stage_count.assign(stage_count, stage_count + n_stages);
  c->stage_thr.assign(stage_thr, stage_thr + n_stages);
  return c;
}

void gifgan_haar_free(void* handle) { delete static_cast<Cascade*>(handle); }

// gray: (h, w) float64. Returns number of grouped detections written to
// out_rects (x, y, w, h) up to max_out.
int gifgan_haar_detect(void* handle, const double* gray, int h, int w,
                       double scale_factor, int min_size,
                       double max_size_factor, int min_neighbors,
                       int* out_rects, int max_out) {
  const Cascade& c = *static_cast<Cascade*>(handle);

  // integral images, zero-padded, row stride w+1
  const int sw = w + 1;
  std::vector<double> ii(static_cast<size_t>(h + 1) * sw, 0.0);
  std::vector<double> ii2(ii.size(), 0.0);
  for (int y = 0; y < h; ++y) {
    double row = 0.0, row2 = 0.0;
    for (int x = 0; x < w; ++x) {
      double v = gray[static_cast<size_t>(y) * w + x];
      row += v;
      row2 += v * v;
      ii[static_cast<size_t>(y + 1) * sw + x + 1] =
          ii[static_cast<size_t>(y) * sw + x + 1] + row;
      ii2[static_cast<size_t>(y + 1) * sw + x + 1] =
          ii2[static_cast<size_t>(y) * sw + x + 1] + row2;
    }
  }

  const double side = std::sqrt(static_cast<double>(h) * w);
  const double max_len = side * max_size_factor;

  std::vector<ScaledFeature> feats(c.n_feats);
  std::vector<int> candidates;

  double scale = std::max(static_cast<double>(min_size) / c.win_w, 1.0);
  while (true) {
    const int ww = static_cast<int>(std::lround(c.win_w * scale));
    const int wh = static_cast<int>(std::lround(c.win_h * scale));
    if (ww > std::min(static_cast<double>(w), max_len) ||
        wh > std::min(static_cast<double>(h), max_len))
      break;

    // scale rects, rebalance first weight, precompute corner offsets;
    // identical rounding to haar.py _scaled_rects
    int ext_x = ww, ext_y = wh;
    for (int f = 0; f < c.n_feats; ++f) {
      const double* r = &c.rects[static_cast<size_t>(f) * 15];
      ScaledFeature& sf = feats[f];
      sf.n = 0;
      double rest = 0.0;
      long area0 = 1;
      for (int k = 0; k < 3; ++k) {
        double wgt = r[5 * k + 4];
        long rx = std::lround(r[5 * k + 0] * scale);
        long ry = std::lround(r[5 * k + 1] * scale);
        long rw = std::lround(r[5 * k + 2] * scale);
        long rh = std::lround(r[5 * k + 3] * scale);
        if (k > 0 && wgt == 0.0) continue;
        long o00 = ry * sw + rx;
        sf.off[sf.n][0] = o00;                     // (y1, x1)
        sf.off[sf.n][1] = o00 + rw;                // (y1, x2)
        sf.off[sf.n][2] = o00 + rh * sw;           // (y2, x1)
        sf.off[sf.n][3] = o00 + rh * sw + rw;      // (y2, x2)
        sf.weight[sf.n] = wgt;
        long area = rw * rh;
        if (k == 0) {
          area0 = area > 0 ? area : 1;
        } else {
          rest += wgt * area;
        }
        ext_x = std::max(ext_x, static_cast<int>(rx + rw));
        ext_y = std::max(ext_y, static_cast<int>(ry + rh));
        ++sf.n;
      }
      sf.weight[0] = -rest / area0;
    }

    const double inv_area = 1.0 / (static_cast<double>(ww) * wh);
    const int stride = std::max(2, static_cast<int>(std::lround(scale)));
    const long w_off_tr = ww;                        // window corners
    const long w_off_bl = static_cast<long>(wh) * sw;
    const long w_off_br = w_off_bl + ww;

    for (int y = 0; y + ext_y <= h; y += stride) {
      for (int x = 0; x + ext_x <= w; x += stride) {
        const long base = static_cast<long>(y) * sw + x;
        const double s1 = ii[base] + ii[base + w_off_br] -
                          ii[base + w_off_tr] - ii[base + w_off_bl];
        const double s2 = ii2[base] + ii2[base + w_off_br] -
                          ii2[base + w_off_tr] - ii2[base + w_off_bl];
        const double mean = s1 * inv_area;
        const double var = s2 * inv_area - mean * mean;
        const double nf = var > 0 ? std::sqrt(var) : 1.0;

        bool alive = true;
        for (int s = 0; s < c.n_stages && alive; ++s) {
          double total = 0.0;
          const int a = c.stage_first[s];
          const int b = a + c.stage_count[s];
          for (int t = a; t < b; ++t) {
            // node 0
            const ScaledFeature& f0 = feats[c.node_feat[2 * t]];
            double v0 = 0.0;
            for (int k = 0; k < f0.n; ++k)
              v0 += f0.weight[k] * rect_sum(ii.data(), base, f0.off[k]);
            v0 *= inv_area;
            int child = (v0 < c.node_thr[2 * t] * nf) ? c.node_left[2 * t]
                                                      : c.node_right[2 * t];
            int leaf_idx;
            if (child <= 0) {
              leaf_idx = -child;
            } else {
              const ScaledFeature& f1 = feats[c.node_feat[2 * t + 1]];
              double v1 = 0.0;
              for (int k = 0; k < f1.n; ++k)
                v1 += f1.weight[k] * rect_sum(ii.data(), base, f1.off[k]);
              v1 *= inv_area;
              leaf_idx = (v1 < c.node_thr[2 * t + 1] * nf)
                             ? -c.node_left[2 * t + 1]
                             : -c.node_right[2 * t + 1];
            }
            total += c.leaves[4 * t + leaf_idx];
          }
          alive = total >= c.stage_thr[s];
        }
        if (alive) {
          candidates.push_back(x);
          candidates.push_back(y);
          candidates.push_back(ww);
          candidates.push_back(wh);
        }
      }
    }
    scale *= scale_factor;
  }

  std::vector<int> grouped;
  group_rectangles(candidates, min_neighbors, 0.2, grouped);
  const int n_out =
      std::min(static_cast<int>(grouped.size() / 4), max_out);
  memcpy(out_rects, grouped.data(), static_cast<size_t>(n_out) * 4 *
                                        sizeof(int));
  return n_out;
}

// Pyramid finisher — the host "deep stage" pass behind the TPU
// early-stage program (gifgan_tpu/track/haar_device.py); survivors are
// few and branchy, exactly the CPU's case:
// resample `gray` to each requested level with the same
// separable triangle (antialiased-linear) kernel as the device program's
// host-precomputed matrices (haar_device.py _resize_matrix), pack the level
// images into a (canvas_h, w) canvas at the given row offsets, and evaluate
// the windows (canvas coordinates) from stage_lo with early exit. One call
// per frame covers every scale — this replaces ~215 ms/clip of host numpy
// matmuls with ~5 ms of C++.
void gifgan_haar_eval_pyramid(void* handle, const double* gray, int h, int w,
                              const int* level_h, const int* level_w,
                              const int* level_row, int n_levels,
                              int canvas_h, const int* xs, const int* ys,
                              int n, int stage_lo, uint8_t* out_pass) {
  std::vector<double> canvas(static_cast<size_t>(canvas_h) * w, 0.0);
  std::vector<int> r_start, c_start;
  std::vector<double> r_wts, c_wts;
  int r_taps, c_taps;
  std::vector<double> tmp;
  for (int lv = 0; lv < n_levels; ++lv) {
    const int lh = level_h[lv], lw = level_w[lv], row = level_row[lv];
    resample_weights(h, lh, r_start, r_wts, r_taps);
    resample_weights(w, lw, c_start, c_wts, c_taps);
    tmp.assign(static_cast<size_t>(lh) * w, 0.0);
    for (int i = 0; i < lh; ++i) {
      double* trow = &tmp[static_cast<size_t>(i) * w];
      const int s0 = r_start[i];
      for (int k = 0; k < r_taps; ++k) {
        const double wt = r_wts[static_cast<size_t>(i) * r_taps + k];
        if (wt == 0.0) continue;
        const double* grow = &gray[static_cast<size_t>(s0 + k) * w];
        for (int x = 0; x < w; ++x) trow[x] += wt * grow[x];
      }
    }
    for (int i = 0; i < lh; ++i) {
      const double* trow = &tmp[static_cast<size_t>(i) * w];
      double* crow = &canvas[static_cast<size_t>(row + i) * w];
      for (int j = 0; j < lw; ++j) {
        const int s0 = c_start[j];
        double acc = 0.0;
        for (int k = 0; k < c_taps; ++k) {
          const double wt = c_wts[static_cast<size_t>(j) * c_taps + k];
          // zero weights pad rows with fewer taps; skipping them also
          // keeps trow[s0 + k] in bounds at the right edge
          if (wt == 0.0) continue;
          acc += wt * trow[s0 + k];
        }
        crow[j] = acc;
      }
    }
  }
  eval_windows_on_image(*static_cast<Cascade*>(handle), canvas.data(),
                        canvas_h, w, xs, ys, n, stage_lo, out_pass);
}

}  // extern "C"

namespace {

// Clipped triangle-kernel resampling weights, matching the Python
// _resize_matrix (haar_device.py): support = max(n_in/n_out, 1); taps at
// floor(center-support)..ceil(center+support); out-of-range taps clamp to
// the edge sample (weights accumulate); rows normalized to sum 1. Output:
// start[i] + dense (n_out, taps) weight rows. Weights replicate
// _resize_matrix's float32 storage exactly (f64 add -> f32 store, then
// sequential-f32 row normalization); the downstream resample ACCUMULATION
// order still differs from numpy's BLAS matmul, so canvas pixels can
// disagree at ~1 ulp — detection parity is asserted statistically over a
// corpus, not guaranteed per-window.
void resample_weights(int n_in, int n_out, std::vector<int>& start,
                      std::vector<double>& wts, int& n_taps) {
  const double scale = static_cast<double>(n_in) / n_out;
  const double support = scale > 1.0 ? scale : 1.0;
  n_taps = 0;
  start.assign(n_out, 0);
  std::vector<int> lo_v(n_out), hi_v(n_out);
  for (int i = 0; i < n_out; ++i) {
    const double center = (i + 0.5) * scale - 0.5;
    int lo = static_cast<int>(std::floor(center - support));
    int hi = static_cast<int>(std::ceil(center + support));
    int clo = lo < 0 ? 0 : (lo > n_in - 1 ? n_in - 1 : lo);
    int chi = hi < 0 ? 0 : (hi > n_in - 1 ? n_in - 1 : hi);
    lo_v[i] = lo;
    hi_v[i] = hi;
    start[i] = clo;
    if (chi - clo + 1 > n_taps) n_taps = chi - clo + 1;
  }
  wts.assign(static_cast<size_t>(n_out) * n_taps, 0.0);
  for (int i = 0; i < n_out; ++i) {
    const double center = (i + 0.5) * scale - 0.5;
    // accumulate and normalize through float32, mirroring _resize_matrix's
    // np.float32 storage exactly (advisor finding r1: double-precision
    // weights here could disagree with the device/numpy matrices on
    // threshold-adjacent windows, making bit-exact parity tests flaky)
    for (int j = lo_v[i]; j <= hi_v[i]; ++j) {
      double wt = 1.0 - std::abs(j - center) / support;
      if (wt < 0.0) wt = 0.0;
      int jc = j < 0 ? 0 : (j > n_in - 1 ? n_in - 1 : j);
      size_t idx = static_cast<size_t>(i) * n_taps + (jc - start[i]);
      // numpy `out[i, j] += wt` with f32 storage: add in f64, store f32
      wts[idx] = static_cast<float>(wts[idx] + wt);
    }
    // numpy row sum replicated as sequential f32 (the Python side uses an
    // explicit sequential f32 sum for the same reason)
    float fsum = 0.0f;
    for (int k = 0; k < n_taps; ++k)
      fsum += static_cast<float>(wts[static_cast<size_t>(i) * n_taps + k]);
    for (int k = 0; k < n_taps; ++k) {
      size_t idx = static_cast<size_t>(i) * n_taps + k;
      wts[idx] = static_cast<float>(wts[idx]) / fsum;
    }
  }
}

void eval_windows_on_image(const Cascade& c, const double* gray, int h,
                           int w, const int* xs, const int* ys, int n,
                           int stage_lo, uint8_t* out_pass) {
  const int sw = w + 1;
  std::vector<double> ii(static_cast<size_t>(h + 1) * sw, 0.0);
  std::vector<double> ii2(ii.size(), 0.0);
  for (int y = 0; y < h; ++y) {
    double row = 0.0, row2 = 0.0;
    for (int x = 0; x < w; ++x) {
      double v = gray[static_cast<size_t>(y) * w + x];
      row += v;
      row2 += v * v;
      ii[static_cast<size_t>(y + 1) * sw + x + 1] =
          ii[static_cast<size_t>(y) * sw + x + 1] + row;
      ii2[static_cast<size_t>(y + 1) * sw + x + 1] =
          ii2[static_cast<size_t>(y) * sw + x + 1] + row2;
    }
  }

  // base-scale features: offsets from the raw rects (scale 1.0 rounding is
  // exact), first weight rebalanced exactly like the scaled path
  std::vector<ScaledFeature> feats(c.n_feats);
  for (int f = 0; f < c.n_feats; ++f) {
    const double* r = &c.rects[static_cast<size_t>(f) * 15];
    ScaledFeature& sf = feats[f];
    sf.n = 0;
    double rest = 0.0;
    long area0 = 1;
    for (int k = 0; k < 3; ++k) {
      double wgt = r[5 * k + 4];
      long rx = std::lround(r[5 * k + 0]);
      long ry = std::lround(r[5 * k + 1]);
      long rw = std::lround(r[5 * k + 2]);
      long rh = std::lround(r[5 * k + 3]);
      if (k > 0 && wgt == 0.0) continue;
      long o00 = ry * sw + rx;
      sf.off[sf.n][0] = o00;
      sf.off[sf.n][1] = o00 + rw;
      sf.off[sf.n][2] = o00 + rh * sw;
      sf.off[sf.n][3] = o00 + rh * sw + rw;
      sf.weight[sf.n] = wgt;
      long area = rw * rh;
      if (k == 0) {
        area0 = area > 0 ? area : 1;
      } else {
        rest += wgt * area;
      }
      ++sf.n;
    }
    sf.weight[0] = -rest / area0;
  }

  const double inv_area = 1.0 / (static_cast<double>(c.win_w) * c.win_h);
  const long w_off_tr = c.win_w;
  const long w_off_bl = static_cast<long>(c.win_h) * sw;
  const long w_off_br = w_off_bl + c.win_w;

  for (int i = 0; i < n; ++i) {
    const long base = static_cast<long>(ys[i]) * sw + xs[i];
    const double s1 = ii[base] + ii[base + w_off_br] - ii[base + w_off_tr] -
                      ii[base + w_off_bl];
    const double s2 = ii2[base] + ii2[base + w_off_br] -
                      ii2[base + w_off_tr] - ii2[base + w_off_bl];
    const double mean = s1 * inv_area;
    const double var = s2 * inv_area - mean * mean;
    const double nf = var > 0 ? std::sqrt(var) : 1.0;

    bool alive = true;
    for (int s = stage_lo; s < c.n_stages && alive; ++s) {
      double total = 0.0;
      const int a = c.stage_first[s];
      const int b = a + c.stage_count[s];
      for (int t = a; t < b; ++t) {
        const ScaledFeature& f0 = feats[c.node_feat[2 * t]];
        double v0 = 0.0;
        for (int k = 0; k < f0.n; ++k)
          v0 += f0.weight[k] * rect_sum(ii.data(), base, f0.off[k]);
        v0 *= inv_area;
        int child = (v0 < c.node_thr[2 * t] * nf) ? c.node_left[2 * t]
                                                  : c.node_right[2 * t];
        int leaf_idx;
        if (child <= 0) {
          leaf_idx = -child;
        } else {
          const ScaledFeature& f1 = feats[c.node_feat[2 * t + 1]];
          double v1 = 0.0;
          for (int k = 0; k < f1.n; ++k)
            v1 += f1.weight[k] * rect_sum(ii.data(), base, f1.off[k]);
          v1 *= inv_area;
          leaf_idx = (v1 < c.node_thr[2 * t + 1] * nf)
                         ? -c.node_left[2 * t + 1]
                         : -c.node_right[2 * t + 1];
        }
        total += c.leaves[4 * t + leaf_idx];
      }
      alive = total >= c.stage_thr[s];
    }
    out_pass[i] = alive ? 1 : 0;
  }
}

}  // namespace
