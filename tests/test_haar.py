"""Native Haar cascade tests: parsing mechanics, integral images, rect
grouping, and (when an OpenCV cascade XML is present) detection quality on
generated-face frames vs noise."""

import os

import numpy as np
import pytest

from gifgan_tpu.track.haar import (HaarDetector, group_rectangles,
                                   integral_images, parse_cascade,
                                   _scaled_rects)

CASCADE_PATHS = [
    "/root/reference/demo/classifier_configs/haarcascade_frontalface_alt2.xml",
    os.path.expanduser("~/haarcascade_frontalface_alt2.xml"),
]


def _cascade_path():
    for p in CASCADE_PATHS:
        if os.path.exists(p):
            return p
    return None


def test_integral_images():
    g = np.arange(12, dtype=np.float64).reshape(3, 4)
    ii, ii2 = integral_images(g)
    assert ii.shape == (4, 5)
    assert ii[0].sum() == 0 and ii[:, 0].sum() == 0
    # rect sum over full image
    assert ii[3, 4] == g.sum()
    assert ii2[3, 4] == (g * g).sum()
    # sub-rect (rows 1-2, cols 1-3)
    sub = ii[3, 4] + ii[1, 1] - ii[1, 4] - ii[3, 1]
    assert sub == g[1:3, 1:4].sum()


def test_group_rectangles():
    """cv2.groupRectangles semantics: keep clusters with STRICTLY more than
    min_neighbors members; 0 = no grouping."""
    boxes = np.array([
        [10, 10, 20, 20], [11, 10, 20, 20], [10, 11, 21, 20],  # cluster of 3
        [80, 80, 20, 20],                                        # singleton
    ])
    out = group_rectangles(boxes, min_neighbors=2)   # 3 > 2 -> kept
    assert out.shape == (1, 4)
    assert abs(out[0, 0] - 10.33) < 1
    assert group_rectangles(boxes, min_neighbors=3).shape == (0, 4)
    out1 = group_rectangles(boxes, min_neighbors=1)  # singleton 1 > 1 false
    assert out1.shape == (1, 4)
    out0 = group_rectangles(boxes, min_neighbors=0)  # ungrouped passthrough
    assert out0.shape == (4, 4)
    assert group_rectangles(np.zeros((0, 4), int), 2).shape == (0, 4)


@pytest.mark.skipif(_cascade_path() is None, reason="no cascade XML on host")
def test_parse_cascade_structure():
    cas = parse_cascade(_cascade_path())
    assert (cas.window_w, cas.window_h) == (20, 20)
    assert len(cas.stage_thr) == 20
    assert cas.stage_count.sum() == len(cas.node_feat)
    assert cas.rects.shape[1:] == (3, 5)
    # feature indices in range
    assert cas.node_feat.max() < cas.rects.shape[0]
    # scaled rect weights rebalance to ~zero weighted area
    sr = _scaled_rects(cas, 1.7)
    warea = (sr[:, :, 4] * sr[:, :, 2] * sr[:, :, 3]).sum(axis=1)
    np.testing.assert_allclose(warea, 0.0, atol=1e-6)


@pytest.mark.skipif(_cascade_path() is None, reason="no cascade XML on host")
def test_detects_faces_not_noise():
    det = HaarDetector(_cascade_path(), min_neighbors=2, min_size=20)
    face_dir = "/root/reference/firebase/public/mturk/nested_dcgan_samples"
    if not os.path.isdir(face_dir):
        pytest.skip("no face samples on host")
    import imageio.v2 as imageio

    files = sorted(os.listdir(face_dir))[:4]
    hits = 0
    for f in files:
        frame = np.asarray(imageio.mimread(
            os.path.join(face_dir, f))[0])[..., :3]
        big = np.repeat(np.repeat(frame, 2, 0), 2, 1)
        dets = det(big, 0)
        hits += int(len(dets) > 0)
    assert hits >= 3, f"only {hits}/4 generated faces detected"

    rng = np.random.default_rng(0)
    noise_hits = sum(
        int(len(det(rng.integers(0, 255, (128, 128, 3), np.uint8), 0)) > 0)
        for _ in range(3))
    assert noise_hits == 0


@pytest.mark.skipif(_cascade_path() is None, reason="no cascade XML on host")
def test_batched_detector_matches_single():
    import imageio.v2 as imageio

    from gifgan_tpu.track.haar import BatchedJaxHaarDetector

    face_dir = "/root/reference/firebase/public/mturk/nested_dcgan_samples"
    if not os.path.isdir(face_dir):
        pytest.skip("no face samples")
    f = sorted(os.listdir(face_dir))[0]
    frames = np.stack([np.asarray(x)[..., :3] for x in
                       imageio.mimread(os.path.join(face_dir, f))])[:4]
    big = np.repeat(np.repeat(frames, 2, 1), 2, 2)

    det_b = BatchedJaxHaarDetector(_cascade_path(), min_neighbors=2,
                                   min_size=20)
    det_s = HaarDetector(_cascade_path(), min_neighbors=2, min_size=20)
    batched = det_b.detect_video(big)
    for i in range(4):
        single = det_s(big[i], i)
        assert len(batched[i]) == len(single)
        for db, ds in zip(batched[i], single):
            assert abs(db.x1 - ds.x1) <= 1 and abs(db.y1 - ds.y1) <= 1


@pytest.mark.skipif(_cascade_path() is None, reason="no cascade XML on host")
def test_native_cpp_cascade_matches_python():
    from gifgan_tpu.data import native_gif
    from gifgan_tpu.track.haar import NativeHaarDetector

    if not native_gif.available():
        pytest.skip("native lib not built")
    face_dir = "/root/reference/firebase/public/mturk/nested_dcgan_samples"
    if not os.path.isdir(face_dir):
        pytest.skip("no face samples")
    import imageio.v2 as imageio

    det_cc = NativeHaarDetector(_cascade_path(), min_neighbors=2, min_size=20)
    det_py = HaarDetector(_cascade_path(), min_neighbors=2, min_size=20)
    for f in sorted(os.listdir(face_dir))[:3]:
        frame = np.asarray(imageio.mimread(
            os.path.join(face_dir, f))[0])[..., :3]
        big = np.repeat(np.repeat(frame, 2, 0), 2, 1)
        gray = np.dot(big.astype(np.float64), [0.299, 0.587, 0.114])
        r_cc = det_cc.detect_rects(gray)
        r_py = det_py.detect_rects(gray)
        assert len(r_cc) == len(r_py)
        if len(r_cc):
            np.testing.assert_allclose(np.sort(r_cc, 0), np.sort(r_py, 0),
                                       atol=2)
    # noise: no false positives
    rng = np.random.default_rng(0)
    assert len(det_cc.detect_rects(rng.uniform(0, 255, (128, 128)))) == 0
