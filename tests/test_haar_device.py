"""DeviceHaarDetector: the pyramid-packed, gather-free cascade.

Semantic target: cv2.CascadeClassifier.detectMultiScale as used by the
reference (track_faces.py:260-262). Parity with the feature-scaled backends
is statistical (image-pyramid vs rect-scaling, like OpenCV old- vs
new-format paths), so these tests assert detection agreement, not
bit-equality."""

import os

import numpy as np
import pytest

from gifgan_tpu.track.haar import HaarDetector
from gifgan_tpu.track.haar_device import DeviceHaarDetector, _plan_levels

_CASCADES = [
    "/root/reference/demo/classifier_configs/haarcascade_frontalface_alt2.xml",
    os.path.expanduser("~/haarcascade_frontalface_alt2.xml"),
]
_FACES = "/root/reference/firebase/public/mturk/nested_dcgan_samples"


def _cascade_path():
    for p in _CASCADES:
        if os.path.exists(p):
            return p
    return None


def _load_clip(t=4, rep=2):
    import imageio.v2 as imageio

    f = sorted(os.listdir(_FACES))[0]
    frames = np.stack([np.asarray(x)[..., :3]
                       for x in imageio.mimread(os.path.join(_FACES, f))])
    frames = np.concatenate([frames] * (t // len(frames) + 1))[:t]
    big = np.repeat(np.repeat(frames, rep, 1), rep, 2)
    return np.dot(big.astype(np.float64), [0.299, 0.587, 0.114])


needs_data = pytest.mark.skipif(
    _cascade_path() is None or not os.path.isdir(_FACES),
    reason="cascade XML / face samples not on host")


@needs_data
def test_level_plan_is_packed_even():
    det = DeviceHaarDetector(_cascade_path())
    levels = _plan_levels(det.cas, 128, 128, 1.1, 20, 1.0)
    assert len(levels) >= 8
    for lv in levels:
        assert lv.row % 2 == 0
    # level sizes shrink geometrically
    assert levels[0].h == 128 and levels[-1].h < 30


@needs_data
def test_agrees_with_host_detector_on_faces():
    import imageio.v2 as imageio

    dd = DeviceHaarDetector(_cascade_path(), min_neighbors=2, min_size=20)
    hd = HaarDetector(_cascade_path(), min_neighbors=2, min_size=20)
    agree = 0
    files = sorted(os.listdir(_FACES))[:6]
    for f in files:
        frame = np.asarray(imageio.mimread(
            os.path.join(_FACES, f))[0])[..., :3]
        big = np.repeat(np.repeat(frame, 2, 0), 2, 1)
        gray = np.dot(big.astype(np.float64), [0.299, 0.587, 0.114])
        rd = dd.detect_rects(gray)
        rh = hd.detect_rects(gray)
        if len(rd) == 0 and len(rh) == 0:
            agree += 1
            continue
        if len(rd) == 0 or len(rh) == 0:
            continue
        # primary (largest) boxes must overlap with IoU > 0.6
        bd = rd[np.argmax(rd[:, 2] * rd[:, 3])]
        bh = rh[np.argmax(rh[:, 2] * rh[:, 3])]
        x1 = max(bd[0], bh[0])
        y1 = max(bd[1], bh[1])
        x2 = min(bd[0] + bd[2], bh[0] + bh[2])
        y2 = min(bd[1] + bd[3], bh[1] + bh[3])
        inter = max(0, x2 - x1) * max(0, y2 - y1)
        union = bd[2] * bd[3] + bh[2] * bh[3] - inter
        if inter / union > 0.6:
            agree += 1
    assert agree >= 5, f"only {agree}/6 clips agree with the host detector"


@needs_data
def test_rejects_noise():
    dd = DeviceHaarDetector(_cascade_path(), min_neighbors=2, min_size=20)
    rng = np.random.default_rng(0)
    hits = sum(
        int(len(dd.detect_rects(
            rng.integers(0, 255, (128, 128)).astype(np.float64))) > 0)
        for _ in range(3))
    assert hits == 0


@needs_data
def test_batch_matches_per_frame():
    dd = DeviceHaarDetector(_cascade_path(), min_neighbors=2, min_size=20)
    grays = _load_clip(t=3)
    batched = dd.detect_batch(grays)
    for i, g in enumerate(grays):
        single = dd.detect_rects(g)
        assert len(batched[i]) == len(single)
        if len(single):
            assert np.abs(batched[i] - single).max() <= 1


@needs_data
def test_detect_video_returns_detections():
    import imageio.v2 as imageio

    dd = DeviceHaarDetector(_cascade_path(), min_neighbors=2, min_size=20)
    f = sorted(os.listdir(_FACES))[0]
    frames = np.stack([np.asarray(x)[..., :3]
                       for x in imageio.mimread(os.path.join(_FACES, f))])[:2]
    big = np.repeat(np.repeat(frames, 2, 1), 2, 2)
    dets = dd.detect_video(big)
    assert len(dets) == 2
    assert all(d.frame_number == i for i, lst in enumerate(dets) for d in lst)
    assert sum(len(lst) for lst in dets) >= 2


@needs_data
def test_pallas_band_kernel_matches_xla_path():
    """The Pallas early-stage band kernel (interpret mode on CPU) must
    produce identical detections to the XLA strided-slice formulation —
    same math, different scheduling."""
    grays = _load_clip(t=2, rep=2)
    d_xla = DeviceHaarDetector(_cascade_path(), min_neighbors=2,
                               use_pallas=False)
    d_pl = DeviceHaarDetector(_cascade_path(), min_neighbors=2,
                              use_pallas=True)
    d_pl._pallas_interpret = True
    r_xla = d_xla.detect_batch(grays)
    r_pl = d_pl.detect_batch(grays)
    assert len(r_xla) == len(r_pl)
    for a, b in zip(r_xla, r_pl):
        assert np.array_equal(a, b), (a, b)


@needs_data
def test_cpp_pyramid_finisher_matches_numpy_fallback(monkeypatch):
    """gifgan_haar_eval_pyramid (C++ separable triangle resample + early-exit
    deep stages) must produce identical detections to the numpy canvas
    fallback on this corpus. The resampler replicates _resize_matrix's f32
    weight storage bit-exactly, but downstream resample accumulation order
    differs from BLAS at ~1 ulp, so this is corpus-level parity (a
    threshold-adjacent window flipping is theoretically possible)."""
    import gifgan_tpu.track.haar as haar_mod

    grays = _load_clip(t=2, rep=2)
    d_native = DeviceHaarDetector(_cascade_path(), min_neighbors=2)
    r_native = d_native.detect_batch(grays)
    if d_native._native is None:
        pytest.skip("native lib not built")

    def no_native(cas):
        raise RuntimeError("forced fallback")

    monkeypatch.setattr(haar_mod, "make_native_cascade_handle", no_native)
    d_numpy = DeviceHaarDetector(_cascade_path(), min_neighbors=2)
    r_numpy = d_numpy.detect_batch(grays)
    assert d_numpy._native is None
    for a, b in zip(r_native, r_numpy):
        assert np.array_equal(a, b), (a, b)


@needs_data
def test_detect_clips_batched_agrees_with_per_clip():
    """detect_clips (N letterbox-padded clips, ONE device program — round-2
    verdict item 6): per-clip structure comes back intact and the primary
    detections agree with per-clip detect_batch (statistical parity, same
    contract as device-vs-host: scale planning follows the padded canvas)."""
    dd = DeviceHaarDetector(_cascade_path(), min_neighbors=2, min_size=20)
    big = _load_clip(t=3, rep=2)      # (3, 128, 128)
    small = _load_clip(t=2, rep=2)[:, :96, :112]   # different size + T
    batched = dd.detect_clips([big, small])
    assert len(batched) == 2
    assert len(batched[0]) == 3 and len(batched[1]) == 2

    solo = dd.detect_batch(big)
    # the padded canvas equals the big clip's own canvas here (128x128 is
    # already the bucket), so the big clip's primary boxes must agree
    for fr in range(3):
        rb, rs = batched[0][fr], solo[fr]
        assert (len(rb) > 0) == (len(rs) > 0)
        if len(rb):
            b = rb[np.argmax(rb[:, 2] * rb[:, 3])]
            s = rs[np.argmax(rs[:, 2] * rs[:, 3])]
            x0, y0 = max(b[0], s[0]), max(b[1], s[1])
            x1 = min(b[0] + b[2], s[0] + s[2])
            y1 = min(b[1] + b[3], s[1] + s[3])
            inter = max(0, x1 - x0) * max(0, y1 - y0)
            union = b[2] * b[3] + s[2] * s[3] - inter
            assert inter / union > 0.6
    # rects never extend past each clip's own bounds (pad region filtered)
    for frames, (h_i, w_i) in zip(batched, ((128, 128), (96, 112))):
        for rects in frames:
            for x, y, w, h in rects:
                assert x >= 0 and y >= 0 and x + w <= w_i and y + h <= h_i
