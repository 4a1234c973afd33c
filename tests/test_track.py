"""Track-pipeline tests: geometry vs hand-computed goldens, association
behavior, stabilization math, end-to-end on synthetic clips with an
injectable detector."""

import os
import numpy as np
import pytest

from gifgan_tpu.core.config import TrackConfig
from gifgan_tpu.track import (Detection, associate_detections,
                              discard_invalid_tracks, expand_bounding_boxes,
                              interpolate_missing_frames, jaccard_index,
                              jaccard_matrix, same_size_crop, TrackStats,
                              combine_stats_files)
from gifgan_tpu.track.stabilize import (fit_similarity,
                                        stabilized_box_update)


def D(x, y, w, h, f, interp=False):
    return Detection(x, y, x + w, y + h, f, interp)


def test_jaccard_index_golden():
    a, b = D(0, 0, 10, 10, 0), D(5, 0, 10, 10, 0)
    # intersection 5x10=50, union 200-50=150
    assert abs(jaccard_index(a, b) - 50 / 150) < 1e-9
    assert jaccard_index(D(0, 0, 4, 4, 0), D(10, 10, 4, 4, 0)) == 0.0
    assert jaccard_index(a, a) == 1.0


def test_jaccard_matrix_matches_scalar():
    boxes = np.array([[0, 0, 10, 10], [5, 0, 15, 10], [20, 20, 24, 24]],
                     np.float32)
    m = np.asarray(jaccard_matrix(boxes, boxes))
    for i in range(3):
        for j in range(3):
            a = Detection(*boxes[i].astype(int), 0)
            b = Detection(*boxes[j].astype(int), 0)
            assert abs(m[i, j] - jaccard_index(a, b)) < 1e-6


def test_association_builds_tracks_with_skip():
    # one face moving slowly; a skip of 2 frames in the middle
    frames = [
        [D(10, 10, 20, 20, 0)],
        [D(11, 10, 20, 20, 1)],
        [],
        [],
        [D(13, 11, 20, 20, 4)],   # skip=2 <= max_skip
        [D(60, 60, 20, 20, 5)],   # unrelated face -> new track
    ]
    tracks = associate_detections(frames, min_jaccard=0.5, max_skip=6)
    assert len(tracks) == 2
    assert [d.frame_number for d in tracks[0]] == [0, 1, 4]


def test_association_respects_max_skip():
    frames = [[D(10, 10, 20, 20, 0)], [], [], [D(10, 10, 20, 20, 3)]]
    tracks = associate_detections(frames, min_jaccard=0.5, max_skip=1)
    assert len(tracks) == 2  # skip=2 > max_skip=1 -> new track


def test_discard_invalid_tracks():
    long_track = [D(0, 0, 10, 10, f) for f in range(25)]
    short_span = [D(0, 0, 10, 10, f) for f in range(5)]
    sparse = [D(0, 0, 10, 10, 0), D(0, 0, 10, 10, 24)]
    stats = TrackStats()
    valid, untracked = discard_invalid_tracks(
        [long_track, short_span, sparse], min_frame_count=20,
        min_total_detections=10, stats=stats)
    assert valid == [long_track]
    assert stats.cnt_drop_because_low_frame_count == 1
    assert stats.cnt_drop_because_low_total_detections == 1
    assert len(untracked) == 7


def test_interpolation_linear():
    track = [D(0, 0, 10, 10, 0), D(10, 20, 10, 10, 5)]
    (filled,) = interpolate_missing_frames([track])
    assert [d.frame_number for d in filled] == [0, 1, 2, 3, 4, 5]
    mid = filled[3]  # 3/5 of the way
    assert (mid.x1, mid.y1) == (6, 12)
    assert mid.interpolated and not filled[0].interpolated


def test_expand_aspect_and_drop():
    # wide box in a 100x100 frame, target square -> expand height
    track = [Detection(20, 40, 60, 50, 0)]  # 40x10
    stats = TrackStats()
    expanded, oversize = expand_bounding_boxes([track], (100, 100),
                                               256, 256, stats=stats)
    (tr,) = expanded
    d = tr[0]
    assert d.width == 40 and d.height == 40  # square now
    assert (d.y1, d.y2) == (25, 65)          # expanded around center y=45

    # box near the edge: expansion exits the frame -> dropped
    edge = [Detection(0, 2, 40, 12, 0)]
    expanded, oversize = expand_bounding_boxes([edge], (100, 100), 256, 256,
                                               stats=stats)
    assert expanded == [] and len(oversize) == 1
    assert stats.cnt_drop_because_expanded_bb_too_big == 1


def test_same_size_crop():
    inpt = D(40, 40, 30, 30, 3)     # center (55, 55)
    target = D(10, 10, 20, 20, 2)   # center (20, 20), size 20
    out = same_size_crop(inpt, target)
    assert (out.x2 - out.x1, out.y2 - out.y1) == (20, 20)
    assert ((out.x1 + out.x2) // 2, (out.y1 + out.y2) // 2) == (55, 55)
    assert out.frame_number == 3


def test_fit_similarity_recovers_transform():
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 100, (30, 2))
    theta, scale, t = 0.3, 1.2, np.array([5.0, -3.0])
    rot = scale * np.array([[np.cos(theta), -np.sin(theta)],
                            [np.sin(theta), np.cos(theta)]])
    dst = src @ rot.T + t
    m = fit_similarity(src, dst)
    np.testing.assert_allclose(m[:, :2], rot, atol=1e-8)
    np.testing.assert_allclose(m[:, 2], t, atol=1e-8)
    assert fit_similarity(src[:1], dst[:1]) is None


def test_stabilized_box_update_kills_rotation():
    d = D(10, 10, 20, 20, 0)
    nxt = D(12, 10, 20, 20, 1)
    # pure translation by (2, 0)
    m = np.array([[1.0, 0.0, 2.0], [0.0, 1.0, 0.0]])
    out = stabilized_box_update(d, nxt, m, target_aspect=1.0)
    assert (out.x1, out.y1, out.x2, out.y2) == (12, 10, 32, 30)
    # pure rotation: box must stay axis-aligned with ~unchanged size
    th = 0.5
    rot = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0]])
    out2 = stabilized_box_update(d, nxt, rot, target_aspect=1.0)
    assert abs((out2.x2 - out2.x1) - 20) <= 1
    assert abs((out2.y2 - out2.y1) - 20) <= 1


def test_stats_merge_and_render(tmp_path):
    a, b = TrackStats(), TrackStats()
    a.cnt_total_detections = 5
    a.observe_jaccard_used(0.72, 1)
    b.cnt_total_detections = 7
    b.observe_jaccard_used(0.72, 1)
    b.observe_jaccard_used(0.9, 0)
    merged = a.merge(b)
    assert merged.cnt_total_detections == 12
    assert merged.histograms["hst_jaccard_used"][0.7] == 2

    a.write(str(tmp_path / "s1"))
    b.write(str(tmp_path / "s2"))
    combined = combine_stats_files([str(tmp_path / "s1" / "stats.json"),
                                    str(tmp_path / "s2" / "stats.json")])
    assert combined.cnt_total_detections == 12
    html = merged.render_html({"min_jaccard": 0.6})
    assert "hst_jaccard_used" in html and "min_jaccard" in html


def test_process_video_end_to_end_with_fake_detector():
    """Synthetic moving square + injected detector: the pipeline should
    produce one stabilized clip of the requested size."""
    from gifgan_tpu.track.pipeline import process_video

    T, H, W = 30, 96, 128
    frames = np.zeros((T, H, W, 3), np.uint8)
    boxes = []
    for t in range(T):
        x = 20 + t  # drifts right 1px/frame
        y = 30
        frames[t, y:y + 40, x:x + 40] = 200
        # checkerboard texture inside the face so LK has corners
        frames[t, y:y + 40:4, x:x + 40] = 90
        frames[t, y:y + 40, x:x + 40:5] = 140
        boxes.append((x, y, 40, 40))

    def detector(frame, i):
        if i % 5 == 0:  # sparse detections force interpolation
            x, y, w, h = boxes[i]
            return [Detection(x, y, x + w, y + h, i)]
        return []

    cfg = TrackConfig(min_frame_count=10, min_total_detections=3,
                      target_size=32, max_corners=50)
    stats = TrackStats()
    clips = process_video(frames, detector, cfg, stats)
    assert stats.cnt_initial_tracks == 1
    assert len(clips) == 1
    clip = clips[0]
    assert clip.shape[1:] == (32, 32, 3)
    assert clip.shape[0] >= 10
    assert clip.dtype == np.uint8
    assert stats.cnt_final_tracks == 1


def _make_square_video(T=30, H=96, W=128):
    frames = np.zeros((T, H, W, 3), np.uint8)
    boxes = []
    for t in range(T):
        x, y = 20 + t, 30
        frames[t, y:y + 40, x:x + 40] = 200
        frames[t, y:y + 40:4, x:x + 40] = 90
        frames[t, y:y + 40, x:x + 40:5] = 140
        boxes.append((x, y, 40, 40))
    return frames, boxes


def test_run_directory_parallel_matches_sequential(tmp_path):
    """workers=3 must produce the same crops and merged stats as the
    sequential path (in-process version of the reference's shard-by-hand +
    stat_combination.py scale-out, SURVEY.md §2.2)."""
    import cv2
    from gifgan_tpu.track.pipeline import run_directory

    frames, boxes = _make_square_video()
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    from gifgan_tpu.data.video import encode_mp4

    for i in range(5):
        encode_mp4(str(in_dir / f"v{i}.mp4"), frames)

    def detector(frame, i):
        if i % 5 == 0:
            x, y, w, h = boxes[i]
            return [Detection(x, y, x + w, y + h, i)]
        return []

    cfg = TrackConfig(min_frame_count=10, min_total_detections=3,
                      target_size=32, max_corners=50)
    out_seq = tmp_path / "seq"
    out_par = tmp_path / "par"
    s1 = run_directory(str(in_dir), str(out_seq), cfg, detector=detector,
                       workers=1)
    s2 = run_directory(str(in_dir), str(out_par), cfg, detector=detector,
                       workers=3)
    assert s1.cnt_files_processed == s2.cnt_files_processed == 5
    assert s1.cnt_final_tracks == s2.cnt_final_tracks == 5
    seq_files = sorted(f for f in os.listdir(out_seq) if f.endswith(".mp4"))
    par_files = sorted(f for f in os.listdir(out_par) if f.endswith(".mp4"))
    assert seq_files == par_files


def test_run_directory_batched_detect_matches_sequential(tmp_path):
    """detect_batch_clips groups N files into one detect_clips call; the
    crops and stats must equal the per-file path. The fake detector's
    detect_clips mirrors DeviceHaarDetector's contract (per clip, per
    frame, (M, 4) x,y,w,h rects) and counts its dispatches to prove the
    grouping actually batches."""
    from gifgan_tpu.data.video import encode_mp4
    from gifgan_tpu.track.pipeline import run_directory

    frames, boxes = _make_square_video()
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(5):
        encode_mp4(str(in_dir / f"v{i}.mp4"), frames)

    def rects_for(i):
        if i % 5 == 0:
            x, y, w, h = boxes[i]
            return np.array([[x, y, w, h]], np.int64)
        return np.zeros((0, 4), np.int64)

    class FakeDeviceDetector:
        dispatches = 0

        def __call__(self, frame, i=0):
            return [Detection.from_rect(r, i) for r in rects_for(i)]

        def detect_clips(self, grays):
            FakeDeviceDetector.dispatches += 1
            return [[rects_for(i) for i in range(g.shape[0])]
                    for g in grays]

    cfg = TrackConfig(min_frame_count=10, min_total_detections=3,
                      target_size=32, max_corners=50)
    det = FakeDeviceDetector()
    s1 = run_directory(str(in_dir), str(tmp_path / "seq"), cfg, detector=det,
                       workers=1)
    assert FakeDeviceDetector.dispatches == 0  # plain path never batches
    s2 = run_directory(str(in_dir), str(tmp_path / "bat"), cfg, detector=det,
                       detect_batch_clips=2)
    assert FakeDeviceDetector.dispatches == 3  # ceil(5 / 2) groups
    assert s1.cnt_files_processed == s2.cnt_files_processed == 5
    assert s1.cnt_final_tracks == s2.cnt_final_tracks == 5
    seq = sorted(f for f in os.listdir(tmp_path / "seq")
                 if f.endswith(".mp4"))
    bat = sorted(f for f in os.listdir(tmp_path / "bat")
                 if f.endswith(".mp4"))
    assert seq == bat

    # round 5: batched detection COMPOSES with decode/track workers — one
    # dispatcher thread owns the device program, the pool decodes/tracks;
    # results and dispatch count must match the serial batched path
    FakeDeviceDetector.dispatches = 0
    s3 = run_directory(str(in_dir), str(tmp_path / "thr"), cfg, detector=det,
                       workers=2, detect_batch_clips=2, resume=False)
    assert FakeDeviceDetector.dispatches == 3  # ceil(5 / 2) groups
    assert s3.cnt_files_processed == 5
    assert s3.cnt_final_tracks == s1.cnt_final_tracks
    thr = sorted(f for f in os.listdir(tmp_path / "thr")
                 if f.endswith(".mp4"))
    assert thr == seq


# ----- detector backend auto-selection (measured crossover as default) ------

def test_select_detector_backend_crossover_matrix():
    """Pins the BASELINE.md crossover policy: device+batch on TPU hosts at
    >=100px frames, native below / without a TPU. Since round 5 workers
    no longer force native — the pipeline's dispatcher thread serializes
    the device program while workers decode/track around it."""
    from gifgan_tpu.track.detect import (AUTO_DETECT_BATCH,
                                         select_detector_backend)

    # realistic 128px mturk distribution, TPU host: device, auto batch 8
    assert select_detector_backend(128, tpu_available=True) == \
        ("device", AUTO_DETECT_BATCH)
    # caller-chosen batch is respected
    assert select_detector_backend(256, tpu_available=True,
                                   detect_batch_clips=16) == ("device", 16)
    # tiny frames: below every measured point -> host path
    assert select_detector_backend(64, tpu_available=True) == ("native", 1)
    # no TPU -> native regardless of size
    assert select_detector_backend(256, tpu_available=False) == ("native", 1)
    # thread-pool workers compose via the dispatcher thread (round 5) —
    # the device path survives
    assert select_detector_backend(256, tpu_available=True,
                                   workers=4) == ("device",
                                                  AUTO_DETECT_BATCH)
    # unknown frame size (probe failed) -> host default
    assert select_detector_backend(None, tpu_available=True) == ("native", 1)
    # no cascade file -> the device/native evaluators can't load a model
    assert select_detector_backend(128, tpu_available=True,
                                   cascade_available=False) == ("native", 1)


def test_run_directory_auto_selects_device_backend(tmp_path, monkeypatch):
    """With detector_backend='auto', a cascade path, and a (faked) TPU, the
    pipeline must probe the source size and construct the DEVICE backend
    with batching — and fall back to the host order for small frames."""
    from gifgan_tpu.data.video import encode_mp4
    from gifgan_tpu.track import detect as D
    from gifgan_tpu.track.pipeline import run_directory

    frames, boxes = _make_square_video()  # 96x128 -> min dim 96... too small
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(3):
        encode_mp4(str(in_dir / f"v{i}.mp4"), frames)

    chosen = {}

    def rects_for(i):
        if i % 5 == 0:
            x, y, w, h = boxes[i]
            return np.array([[x, y, w, h]], np.int64)
        return np.zeros((0, 4), np.int64)

    class FakeDetector:
        def __call__(self, frame, i=0):
            return [Detection.from_rect(r, i) for r in rects_for(i)]

        def detect_clips(self, grays):
            return [[rects_for(i) for i in range(g.shape[0])]
                    for g in grays]

    def fake_default_detector(cascade_path=None, scale_factor=1.1,
                              min_neighbors=3, min_size=20,
                              max_size_factor=1.0, backend="auto"):
        chosen["backend"] = backend
        return FakeDetector()

    monkeypatch.setattr(D, "default_detector", fake_default_detector)
    monkeypatch.setattr(D, "_tpu_available", lambda: True)

    cfg = TrackConfig(min_frame_count=10, min_total_detections=3,
                      target_size=32, max_corners=50)
    # 96px min dim is below the 100px crossover floor -> host order
    s = run_directory(str(in_dir), str(tmp_path / "small"), cfg,
                      cascade_path="cascade.xml")
    assert chosen["backend"] == "auto"
    assert s.cnt_files_processed == 3

    # pad the video to >=128px min dim -> device + batching
    big = np.pad(frames, ((0, 0), (16, 16), (0, 0), (0, 0)))
    in_big = tmp_path / "in_big"
    in_big.mkdir()
    for i in range(3):
        encode_mp4(str(in_big / f"b{i}.mp4"), big)
    s = run_directory(str(in_big), str(tmp_path / "big"), cfg,
                      cascade_path="cascade.xml")
    assert chosen["backend"] == "device"
    assert s.cnt_files_processed == 3

    # no TPU -> native/host order even for big frames
    monkeypatch.setattr(D, "_tpu_available", lambda: False)
    run_directory(str(in_big), str(tmp_path / "notpu"), cfg,
                  cascade_path="cascade.xml", resume=False)
    assert chosen["backend"] == "auto"


def test_probe_decode_reused_not_repeated(tmp_path, monkeypatch):
    """The backend probe's decode of the first clip is handed through to
    processing — every file is decoded exactly once on all three dispatch
    paths (round-4 advisor: the first clip used to be decoded twice)."""
    from gifgan_tpu.track import detect as D
    from gifgan_tpu.track.pipeline import run_directory

    frames, boxes = _make_square_video()
    big = np.pad(frames, ((0, 0), (16, 16), (0, 0), (0, 0)))

    def rects_for(i):
        if i % 5 == 0:
            x, y, w, h = boxes[i]
            return np.array([[x, y, w, h]], np.int64)
        return np.zeros((0, 4), np.int64)

    class FakeDetector:
        def __call__(self, frame, i=0):
            return [Detection.from_rect(r, i) for r in rects_for(i)]

        def detect_clips(self, grays):
            return [[rects_for(i) for i in range(g.shape[0])]
                    for g in grays]

    monkeypatch.setattr(
        D, "default_detector",
        lambda **kw: FakeDetector())
    cfg = TrackConfig(min_frame_count=10, min_total_detections=3,
                      target_size=32, max_corners=50)

    names = [f"v{i}.mp4" for i in range(3)]
    for tpu, workers, sub in ((False, 1, "serial"), (True, 1, "batched"),
                              (False, 2, "threads")):
        monkeypatch.setattr(D, "_tpu_available", lambda tpu=tpu: tpu)
        counts = {}

        def counting_decode(path, counts=counts):
            counts[path] = counts.get(path, 0) + 1
            return big

        in_dir = tmp_path / ("in_" + sub)
        in_dir.mkdir()
        for n in names:
            (in_dir / n).write_bytes(b"")  # decode_fn ignores contents
        s = run_directory(str(in_dir), str(tmp_path / ("out_" + sub)), cfg,
                          cascade_path="cascade.xml",
                          decode_fn=counting_decode, workers=workers)
        assert s.cnt_files_processed == 3, sub
        assert len(counts) == 3 and all(v == 1 for v in counts.values()), \
            (sub, counts)
