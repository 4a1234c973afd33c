"""Dataset downloaders (stubbed HTTP), video_to_frames, z-broadcast/tween."""

import gzip
import io
import os
import zipfile

import jax.numpy as jnp
import numpy as np
import pytest

from gifgan_tpu.data import download
from gifgan_tpu.invert.optimize import broadcast_z_forward, tween_z


def test_download_mnist_stubbed(tmp_path):
    def fetch(url):
        assert url.startswith(download.MNIST_BASE)
        return gzip.compress(b"\x00" * 32)

    written = download.download_mnist(str(tmp_path), fetch)
    assert len(written) == 4
    assert os.path.exists(tmp_path / "mnist" / "train-images-idx3-ubyte")
    # idempotent resume
    assert download.download_mnist(str(tmp_path), fetch) == []


def test_download_celeba_stubbed(tmp_path):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("celebA/0001.jpg", b"fake")

    out = download.download_celeb_a(str(tmp_path), "http://x/celebA.zip",
                                    lambda url: buf.getvalue())
    assert os.path.exists(os.path.join(out, "0001.jpg"))
    assert not os.path.exists(tmp_path / "celebA.zip")  # archive cleaned up


def test_download_lsun_stubbed(tmp_path):
    calls = []
    written = download.download_lsun(str(tmp_path), ["bedroom"],
                                     fetch_fn=lambda u: calls.append(u) or b"z")
    assert len(written) == 1 and "bedroom_train_lmdb" in calls[0]


def test_video_to_frames(tmp_path):
    pytest.importorskip("cv2")
    from gifgan_tpu.data.synthetic import synthetic_clip
    from gifgan_tpu.data.video import encode_mp4, video_to_frames
    from gifgan_tpu.track.boxes import Detection

    clip = synthetic_clip(0, length=25, size=128)
    vp = str(tmp_path / "v.mp4")
    encode_mp4(vp, clip, fps=25)

    # no detector: plain frame extraction at ~5 fps
    stats = video_to_frames(vp, str(tmp_path / "plain"), rate=5)
    assert stats["kept"] == stats["frames"] >= 4

    # detector: crop around the best face, drop no-face frames
    def det(frame, i):
        if i >= 10:
            return []
        return [Detection(30, 30, 90, 90, i)]

    stats = video_to_frames(vp, str(tmp_path / "faces"), rate=25,
                            detector=det, crop_size=64)
    assert stats["no_face"] > 0 and stats["kept"] > 0
    import imageio.v2 as imageio

    f = np.asarray(imageio.imread(
        tmp_path / "faces" / "frame_000000.png"))
    assert f.shape == (64, 64, 3)


def test_broadcast_z_forward_and_tween():
    zs = jnp.arange(24, dtype=jnp.float32).reshape(6, 4)  # 2 videos x T=3
    out = np.asarray(broadcast_z_forward(zs, from_frame=1, vid_length=3))
    # frame 0 unchanged; frames 1,2 take frame 1's value
    np.testing.assert_array_equal(out[0], np.asarray(zs[0]))
    np.testing.assert_array_equal(out[2], np.asarray(zs[1]))
    np.testing.assert_array_equal(out[5], np.asarray(zs[4]))

    tw = np.asarray(tween_z(jnp.zeros(4), jnp.ones(4), 5))
    assert tw.shape == (5, 4)
    np.testing.assert_allclose(tw[2], 0.5)


def test_tween_z_batched():
    za = jnp.zeros((3, 4))
    zb = jnp.ones((3, 4))
    tw = np.asarray(tween_z(za, zb, 5))
    assert tw.shape == (5, 3, 4)
    np.testing.assert_allclose(tw[2], 0.5)
    np.testing.assert_allclose(tw[0], 0.0)
    np.testing.assert_allclose(tw[4], 1.0)
