"""Eval-layer tests: track rate on synthetic clips, activation analyzer
separation, survey export layout."""

import json
import os

import jax
import numpy as np
import pytest

from gifgan_tpu.core.config import DCGANConfig, TrackConfig
from gifgan_tpu.data.synthetic import synthetic_clips
from gifgan_tpu.eval import (activation_distances, export_survey_samples,
                             face_track_rate, track_rate_report)
from gifgan_tpu.eval.survey import stride_control_videos
from gifgan_tpu.models import dcgan
from gifgan_tpu.track.boxes import Detection
from gifgan_tpu.track.detect import CallableDetector


def brightness_detector():
    def fn(frame, i):
        g = frame.astype(int).sum(-1)
        ys, xs = np.where(g > g.mean() + g.std())
        if len(xs) < 40:
            return []
        return [(xs.min(), ys.min(), xs.max() - xs.min(),
                 ys.max() - ys.min())]
    return CallableDetector(fn)


def test_face_track_rate_separates_good_from_noise(tmp_path):
    good = list(synthetic_clips(3, length=16, size=64, seed=0))
    noise = [np.random.default_rng(i).integers(0, 255, (16, 64, 64, 3),
                                               np.uint8) for i in range(3)]
    det = brightness_detector()
    cfg = TrackConfig(min_frame_count=6, min_total_detections=3, max_skip=2,
                      target_size=32, max_corners=50)
    res_good = face_track_rate(good, det, cfg)
    res_noise = face_track_rate(noise, det, cfg)
    assert res_good["rate"] > res_noise["rate"]
    assert res_good["total"] == 3

    report = track_rate_report({"good": res_good, "noise": res_noise},
                               out_dir=str(tmp_path))
    assert "good:" in report
    assert os.path.exists(tmp_path / "summary.txt")
    assert os.path.exists(tmp_path / "good_results" / "stats.txt")


def test_activation_distances_intra_vs_inter(key):
    cfg = DCGANConfig(output_size=32, c_dim=3, z_dim=8, gf_dim=8, df_dim=8)
    params, state = dcgan.init(key, cfg)
    boost = lambda t: jax.tree_util.tree_map(lambda x: x * 6.0, t)
    params = dcgan.DCGANParams(params.generator, boost(params.discriminator))

    clips = synthetic_clips(4, length=8, size=32, seed=3)
    videos = [c.astype(np.float32) / 127.5 - 1.0 for c in clips]
    res = activation_distances(params, state, cfg, videos,
                               frames_per_video=4)
    s = res["summary"]
    assert s["n_frames"] > 0
    assert s["intra_mean"] > 0 and s["inter_mean"] > 0
    # frames within a synthetic clip are more similar than across clips
    assert s["separation"] > 1.0


def test_survey_export_and_stride_control(tmp_path):
    pytest.importorskip("imageio")

    def variant_fn(seed):
        def fn(n):
            return synthetic_clips(n, length=4, size=16, seed=seed)
        return fn

    manifest = export_survey_samples(
        {"nested": variant_fn(1), "rnn": variant_fn(2)},
        str(tmp_path), samples_per_variant=3)
    assert set(manifest["variants"]) == {"nested", "rnn"}
    assert os.path.exists(tmp_path / "nested_samples" / "2.gif")
    with open(tmp_path / "manifest.json") as f:
        assert json.load(f)["samples_per_variant"] == 3

    grids = np.random.default_rng(0).integers(
        0, 255, (2, 64, 64, 3), np.uint8)
    vids = stride_control_videos(grids, tile=16, frames_per_video=4,
                                 num_videos=5)
    assert vids.shape == (5, 4, 16, 16, 3)


def test_metric_parity_on_reference_published_samples():
    """Our face-track-rate evaluator, with the reference's eval params, must
    reproduce the reference's own published tracker stats on its MTurk
    sample GIFs (full 250-set: ours 202 vs published 201). This pins a
    25-GIF subset (measured 19/25) within a small drift band."""
    import os

    ref_dir = "/root/reference/firebase/public/mturk/rnn_samples"
    cascade = ("/root/reference/demo/classifier_configs/"
               "haarcascade_frontalface_alt2.xml")
    if not os.path.isdir(ref_dir) or not os.path.exists(cascade):
        pytest.skip("reference sample set unavailable")
    from gifgan_tpu.core.config import TrackConfig
    from gifgan_tpu.data.video import read_gif
    from gifgan_tpu.eval import face_track_rate
    from gifgan_tpu.track.detect import default_detector

    cfg = TrackConfig(min_frame_count=6, min_total_detections=3, max_skip=2,
                      target_size=64, scale_factor=1.1, min_neighbors=4,
                      max_corners=1000, corner_quality=0.01,
                      corner_min_distance=8.0, lk_window=19, lk_levels=2)
    det = default_detector(cascade_path=cascade, scale_factor=1.1,
                           min_neighbors=4, min_size=32, max_size_factor=1.0)
    clips = [read_gif(os.path.join(ref_dir, f))
             for f in sorted(os.listdir(ref_dir))[:25] if f.endswith(".gif")]
    r = face_track_rate(clips, det, cfg)
    assert 16 <= r["tracked"] <= 23, r


def test_visualize_all_modes(tmp_path):
    """All 5 reference visualize modes (utils.py:149-202) produce files of
    the right kind and count."""
    from gifgan_tpu.eval.visualize import visualize

    def fake_sampler(z):
        z = np.asarray(z)
        v = np.tanh(z.sum(axis=1))[:, None, None, None]
        return np.tile(v, (1, 16, 16, 3)).astype(np.float32)

    out = visualize(fake_sampler, z_dim=10, batch_size=8, option=0,
                    out_dir=str(tmp_path / "o0"))
    assert len(out) == 1 and out[0].endswith(".png")
    out = visualize(fake_sampler, 10, 8, 1, str(tmp_path / "o1"), num_dims=4)
    assert len(out) == 4 and all(p.endswith(".png") for p in out)
    out = visualize(fake_sampler, 10, 8, 2, str(tmp_path / "o2"), num_dims=3)
    assert len(out) == 3 and all(p.endswith(".gif") for p in out)
    out = visualize(fake_sampler, 10, 8, 3, str(tmp_path / "o3"), num_dims=3)
    assert len(out) == 3 and all(p.endswith(".gif") for p in out)
    out = visualize(fake_sampler, 10, 8, 4, str(tmp_path / "o4"), num_dims=4)
    assert out[-1].endswith("test_gif_merged.gif")
    assert len(out) == 5
    from gifgan_tpu.data.video import read_gif
    merged = read_gif(out[-1])
    assert merged.shape[0] == 16  # 8 forward + 8 backward bounce
