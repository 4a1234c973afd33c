"""JAX corner detection + LK flow vs synthetic ground truth and cv2."""

import numpy as np
import pytest

import jax.numpy as jnp

from gifgan_tpu.track.flow_jax import (jax_flow_backend, lk_flow,
                                       shi_tomasi_corners)


def checkerboard(h, w, cell=8, phase=(0, 0)):
    yy, xx = np.mgrid[0:h, 0:w]
    return (((yy + phase[0]) // cell + (xx + phase[1]) // cell) % 2
            ).astype(np.float32) * 200.0


def test_corners_on_checkerboard():
    img = checkerboard(64, 64)
    pts, valid = shi_tomasi_corners(jnp.asarray(img), max_corners=64,
                                    min_distance=4)
    pts, valid = np.asarray(pts), np.asarray(valid)
    assert valid.sum() > 10
    # corner points should sit near cell intersections (multiples of 8)
    good = pts[valid]
    off = np.minimum(good % 8, 8 - (good % 8))
    assert np.median(off) <= 2.0


def test_corners_flat_image_none():
    img = np.full((64, 64), 100.0, np.float32)
    _, valid = shi_tomasi_corners(jnp.asarray(img), max_corners=32)
    assert np.asarray(valid).sum() == 0


def test_lk_recovers_translation():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (96, 96)).astype(np.float32)
    # smooth it so gradients are informative
    import jax
    k = jnp.ones((5, 5, 1, 1)) / 25.0
    smooth = jax.lax.conv_general_dilated(
        jnp.asarray(base)[None, :, :, None], k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
    smooth = np.asarray(smooth)
    dx, dy = 3, -2
    shifted = np.roll(np.roll(smooth, dy, axis=0), dx, axis=1)

    pts, valid = shi_tomasi_corners(jnp.asarray(smooth), max_corners=50,
                                    min_distance=6)
    new_pts, status = lk_flow(jnp.asarray(smooth), jnp.asarray(shifted),
                              pts, valid, win=15, levels=2)
    flow = np.asarray(new_pts - pts)[np.asarray(status)]
    assert len(flow) > 5
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=0.5)


def test_jax_flow_backend_in_stabilizer():
    """End-to-end: stabilize a drifting track using the JAX backend and
    compare against the cv2 backend's boxes."""
    from gifgan_tpu.track.boxes import Detection
    from gifgan_tpu.track.stabilize import cv2_flow_backend, stabilize_tracks

    T, H, W = 12, 96, 128
    rng = np.random.default_rng(1)
    texture = rng.uniform(50, 200, (40, 40)).astype(np.float32)
    frames = []
    track = []
    for t in range(T):
        x, y = 20 + t, 30
        f = np.zeros((H, W), np.float32)
        f[y:y + 40, x:x + 40] = texture
        frames.append(f.astype(np.uint8))
        track.append(Detection(x, y, x + 40, y + 40, t))

    out_jax = stabilize_tracks(frames, [list(track)], (W, H),
                               min_frame_count=6,
                               flow_backend=jax_flow_backend)
    assert out_jax[0] is not None and len(out_jax[0]) >= 6

    try:
        out_cv = stabilize_tracks(frames, [list(track)], (W, H),
                                  min_frame_count=6,
                                  flow_backend=cv2_flow_backend)
    except Exception:
        pytest.skip("cv2 flow unavailable")
    # both backends should track the same drift: compare box centers
    n = min(len(out_jax[0]), len(out_cv[0]))
    for dj, dc in zip(out_jax[0][:n], out_cv[0][:n]):
        cj = ((dj.x1 + dj.x2) / 2, (dj.y1 + dj.y2) / 2)
        cc = ((dc.x1 + dc.x2) / 2, (dc.y1 + dc.y2) / 2)
        assert abs(cj[0] - cc[0]) <= 3 and abs(cj[1] - cc[1]) <= 3
