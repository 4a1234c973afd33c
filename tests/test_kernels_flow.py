"""MXU (gather-free) corner + LK flow kernels: goldens vs the pure-JAX
reference impl, synthetic ground truth, and 3 px stabilizer parity vs cv2."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gifgan_tpu.kernels import flow as kflow
from gifgan_tpu.track import flow_jax


def _smooth(img):
    k = jnp.ones((5, 5, 1, 1)) / 25.0
    out = jax.lax.conv_general_dilated(
        jnp.asarray(img)[None, :, :, None], k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
    return np.asarray(out)


def test_sample_windows_matches_bilinear_gather():
    """The one-hot-matmul window sampler must agree with the advanced-
    indexing bilinear gather in flow_jax (away from borders, where both
    are exact)."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (64, 80)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(12, 50, (17, 2)).astype(np.float32))
    win = 9
    ours = kflow.sample_windows(img, pts, win)

    r = win // 2
    dxs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(dxs, dxs, indexing="ij")
    wx = pts[:, 0, None, None] + gx[None]
    wy = pts[:, 1, None, None] + gy[None]
    ref = flow_jax._bilinear(img, wx, wy)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-3)


def test_batch_corners_match_single():
    rng = np.random.default_rng(1)
    imgs = np.stack([_smooth(rng.uniform(0, 255, (64, 64))) for _ in range(3)])
    pts_b, valid_b = kflow.shi_tomasi_corners_batch(jnp.asarray(imgs),
                                                    max_corners=32,
                                                    min_distance=6)
    for i in range(3):
        pts_s, valid_s = flow_jax.shi_tomasi_corners(jnp.asarray(imgs[i]),
                                                     max_corners=32,
                                                     min_distance=6)
        assert int(np.asarray(valid_b)[i].sum()) == int(np.asarray(valid_s).sum())
        got = set(map(tuple, np.asarray(pts_b)[i][np.asarray(valid_b)[i]]))
        want = set(map(tuple, np.asarray(pts_s)[np.asarray(valid_s)]))
        assert got == want


def test_lk_batch_recovers_translations():
    """Each pair in the batch has a different shift; all must be recovered."""
    rng = np.random.default_rng(2)
    shifts = [(3, -2), (-1, 4), (2, 2)]
    img0s, img1s = [], []
    for _ in shifts:
        img0s.append(_smooth(rng.uniform(0, 255, (96, 96))))
    for img0, (dx, dy) in zip(img0s, shifts):
        img1s.append(np.roll(np.roll(img0, dy, axis=0), dx, axis=1))
    img0s, img1s = np.stack(img0s), np.stack(img1s)

    pts, valid = kflow.shi_tomasi_corners_batch(jnp.asarray(img0s),
                                                max_corners=50,
                                                min_distance=6)
    new_pts, status = kflow.lk_flow_batch(jnp.asarray(img0s),
                                          jnp.asarray(img1s), pts, valid,
                                          win=15, levels=2)
    flow = np.asarray(new_pts - pts)
    status = np.asarray(status)
    for i, (dx, dy) in enumerate(shifts):
        f = flow[i][status[i]]
        assert len(f) > 5
        np.testing.assert_allclose(np.median(f, axis=0), [dx, dy], atol=0.5)


def test_mxu_backend_stabilizer_3px_parity_vs_cv2():
    """Same contract as the flow_jax parity test: stabilized box centers
    within 3 px of the cv2 backend's."""
    from gifgan_tpu.track.boxes import Detection
    from gifgan_tpu.track.stabilize import cv2_flow_backend, stabilize_tracks

    T, H, W = 12, 96, 128
    rng = np.random.default_rng(1)
    texture = rng.uniform(50, 200, (40, 40)).astype(np.float32)
    frames, track = [], []
    for t in range(T):
        x, y = 20 + t, 30
        f = np.zeros((H, W), np.float32)
        f[y:y + 40, x:x + 40] = texture
        frames.append(f.astype(np.uint8))
        track.append(Detection(x, y, x + 40, y + 40, t))

    out_mxu = stabilize_tracks(frames, [list(track)], (W, H),
                               min_frame_count=6,
                               flow_backend=kflow.mxu_flow_backend)
    assert out_mxu[0] is not None and len(out_mxu[0]) >= 6
    try:
        out_cv = stabilize_tracks(frames, [list(track)], (W, H),
                                  min_frame_count=6,
                                  flow_backend=cv2_flow_backend)
    except Exception:
        pytest.skip("cv2 flow unavailable")
    n = min(len(out_mxu[0]), len(out_cv[0]))
    for dm, dc in zip(out_mxu[0][:n], out_cv[0][:n]):
        cm = ((dm.x1 + dm.x2) / 2, (dm.y1 + dm.y2) / 2)
        cc = ((dc.x1 + dc.x2) / 2, (dc.y1 + dc.y2) / 2)
        assert abs(cm[0] - cc[0]) <= 3 and abs(cm[1] - cc[1]) <= 3


def test_flow_pairs_batched_matches_per_pair():
    """One batched dispatch must equal per-pair calls (the clip-stacking
    path the stabilizer uses to amortize device round-trips)."""
    rng = np.random.default_rng(3)
    img0s = np.stack([_smooth(rng.uniform(0, 255, (64, 64)))
                      for _ in range(4)])
    img1s = np.stack([np.roll(i, 1, axis=1) for i in img0s])
    pts_b, new_b, st_b, n_b = kflow.flow_pairs(img0s, img1s, max_corners=30)
    for i in range(4):
        pts_s, new_s, st_s, n_s = kflow.flow_pairs(img0s[i:i+1],
                                                   img1s[i:i+1],
                                                   max_corners=30)
        np.testing.assert_allclose(pts_b[i], pts_s[0], atol=1e-4)
        np.testing.assert_allclose(new_b[i][st_b[i]], new_s[0][st_s[0]],
                                   atol=1e-3)


def test_pallas_refine_matches_matmul_path():
    """The fused Pallas LK kernel (interpret mode on CPU) must agree with
    the matmul-resampling iteration within sub-pixel tolerance."""
    rng = np.random.default_rng(4)
    img0s = np.stack([_smooth(rng.uniform(0, 255, (96, 96)))
                      for _ in range(2)])
    img1s = np.stack([np.roll(np.roll(i, -2, axis=0), 3, axis=1)
                      for i in img0s])
    pts, valid = kflow.shi_tomasi_corners_batch(jnp.asarray(img0s),
                                                max_corners=40,
                                                min_distance=6)
    a = kflow.lk_flow_batch(jnp.asarray(img0s), jnp.asarray(img1s), pts,
                            valid, win=15, levels=2, pallas_refine="off")
    b = kflow.lk_flow_batch(jnp.asarray(img0s), jnp.asarray(img1s), pts,
                            valid, win=15, levels=2,
                            pallas_refine="interpret")
    st = np.asarray(a[1]) & np.asarray(b[1])
    # statuses broadly agree and tracked positions match closely
    assert st.sum() > 20
    np.testing.assert_allclose(np.asarray(a[0])[st], np.asarray(b[0])[st],
                               atol=0.35)
    # and both recover the known shift
    flow = np.asarray(b[0] - pts)
    for i in range(2):
        f = flow[i][np.asarray(b[1])[i]]
        np.testing.assert_allclose(np.median(f, axis=0), [3, -2], atol=0.5)
