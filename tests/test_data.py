"""Data subsystem tests: synthetic clips, video/GIF IO roundtrips, prefetch
loader, scraper logic with stubbed HTTP."""

import os

import numpy as np
import pytest

from gifgan_tpu.data import scrape, synthetic
from gifgan_tpu.data.loader import PrefetchLoader, batches_from_array


def test_synthetic_clips_deterministic():
    a = synthetic.synthetic_clips(2, length=4, size=32, seed=7)
    b = synthetic.synthetic_clips(2, length=4, size=32, seed=7)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 4, 32, 32, 3) and a.dtype == np.uint8
    # frames actually move
    assert np.abs(a[0, 0].astype(int) - a[0, 3].astype(int)).max() > 10


def test_synthetic_stills():
    s = synthetic.synthetic_stills(5, size=16)
    assert s.shape == (5, 16, 16, 3)


def test_mp4_roundtrip(tmp_path):
    from gifgan_tpu.data import video

    if not video.HAVE_CV2:
        pytest.skip("no cv2")
    clip = synthetic.synthetic_clip(0, length=8, size=64)
    path = str(tmp_path / "clip.mp4")
    video.encode_mp4(path, clip)
    assert os.path.exists(path)
    decoded = video.decode_clip(path, 8, 64)
    assert decoded.shape == (8, 64, 64, 3)
    # lossy codec: just check gross similarity
    assert np.abs(decoded.astype(int) - clip.astype(int)).mean() < 30

    with pytest.raises(video.ClipTooShortError):
        video.decode_clip(path, 99, 64, strict=True)
    padded = video.decode_clip(path, 12, 64, strict=False)
    assert padded.shape == (12, 64, 64, 3)
    np.testing.assert_array_equal(padded[8], padded[11])


def test_gif_roundtrip(tmp_path):
    from gifgan_tpu.data import video

    if not video.HAVE_IMAGEIO:
        pytest.skip("no imageio")
    clip = synthetic.synthetic_clip(1, length=5, size=32)
    path = str(tmp_path / "x.gif")
    video.write_gif(path, clip, fps=10)
    assert os.path.exists(path) and not os.path.exists(path + ".tmp.gif")
    back = video.read_gif(path)
    assert back.shape[0] == 5 and back.shape[3] == 3


def test_sample_frames_from_video(tmp_path):
    from gifgan_tpu.data import video

    if not video.HAVE_CV2:
        pytest.skip("no cv2")
    clip = synthetic.synthetic_clip(2, length=20, size=48)
    path = str(tmp_path / "clip.mp4")
    video.encode_mp4(path, clip)
    frames = video.sample_frames_from_video(path, 5, 32,
                                            np.random.default_rng(0))
    assert len(frames) == 5
    assert frames[0].shape == (32, 32, 3)


def test_bulk_resize(tmp_path):
    from gifgan_tpu.data import video

    if not video.HAVE_CV2:
        pytest.skip("no cv2")
    ind, outd = tmp_path / "in", tmp_path / "out"
    ind.mkdir()
    video.encode_mp4(str(ind / "long.mp4"),
                     synthetic.synthetic_clip(0, 16, 64))
    video.encode_mp4(str(ind / "short.mp4"),
                     synthetic.synthetic_clip(1, 4, 64))
    stats = video.bulk_resize(str(ind), str(outd), width=32, length=10)
    assert stats == {"written": 1, "skipped_short": 1, "errors": 0}
    out = video.decode_clip(str(outd / "long.mp4"), 10, 32)
    assert out.shape == (10, 32, 32, 3)


def test_prefetch_loader_orders_and_propagates_errors():
    data = np.arange(40).reshape(10, 4)
    batches = list(PrefetchLoader(batches_from_array(
        data, batch_size=3, shuffle=False)))
    assert len(batches) == 3  # drop remainder
    np.testing.assert_array_equal(batches[0], data[:3])

    def bad_iter():
        yield data[:3]
        raise RuntimeError("decode exploded")

    loader = PrefetchLoader(bad_iter())
    next(loader)
    with pytest.raises(RuntimeError, match="decode exploded"):
        next(loader)


def test_prefetch_loader_abandonment_releases_worker():
    # An early break (steps_limit in the train loops, or a test taking one
    # batch) abandons the loader mid-stream; the worker must not stay
    # blocked on q.put forever holding batches. Regression for the
    # full-suite segfault: ~200 leaked workers were alive during the
    # suite's heaviest compile.
    def infinite():
        while True:
            yield np.zeros((3, 4))

    loader = PrefetchLoader(infinite(), depth=1)
    next(loader)  # worker is now parked trying to put the next batch
    thread = loader._thread
    loader.close()
    thread.join(timeout=5.0)
    assert not thread.is_alive()

    # __del__ covers consumers that never call close()
    loader2 = PrefetchLoader(infinite(), depth=1)
    next(loader2)
    thread2 = loader2._thread
    del loader2
    thread2.join(timeout=5.0)
    assert not thread2.is_alive()

    # normal exhaustion still terminates cleanly and close() stays safe
    fin = PrefetchLoader(batches_from_array(
        np.arange(40).reshape(10, 4), batch_size=3, shuffle=False))
    list(fin)
    fin.close()
    assert not fin._thread.is_alive()


def test_scraper_keyword_parse_and_dedup(tmp_path):
    text = "tried1\ntried2\n# keywords not tried yet\nface\n\nsmile\n"
    assert scrape.parse_keywords(text) == ["face", "smile"]

    payload = ('{"data":[{"images":{"original":{'
               '"mp4":"https:\\/\\/media.giphy.com\\/media\\/abc123\\/giphy.mp4"}}},'
               '{"images":{"original":{'
               '"mp4":"https:\\/\\/media.giphy.com\\/media\\/def456\\/giphy.mp4"}}}]}')
    urls = scrape.extract_mp4_urls(payload)
    assert len(urls) == 2
    assert scrape.media_id(urls[0]) == "abc123"

    calls = []

    def fetch(url):
        calls.append(url)
        if "api.giphy" in url or "search" in url:
            return payload.encode()
        return b"FAKE_MP4_BYTES"

    s = scrape.Scraper(str(tmp_path), fetch, num_threads=2,
                       items_per_thread=100)
    stats = s.scrape(["face"])
    assert stats.per_keyword["face"] == 2  # deduped across threads/pages
    files = sorted(os.listdir(tmp_path / "face"))
    assert files == ["abc123.mp4", "def456.mp4"]

    # second scraper instance seeds dedup from disk -> nothing new
    s2 = scrape.Scraper(str(tmp_path), fetch, num_threads=1,
                        items_per_thread=100)
    stats2 = s2.scrape(["face"])
    assert stats2.new_total == 0


def test_scraper_duplicate_on_disk_raises(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    (tmp_path / "a" / "x1.mp4").write_bytes(b"")
    (tmp_path / "b" / "x1.mp4").write_bytes(b"")
    with pytest.raises(RuntimeError, match="duplicate"):
        scrape.scan_existing(str(tmp_path))


def test_scraper_failure_cutoff(tmp_path):
    def always_fail(url):
        raise IOError("net down")

    s = scrape.Scraper(str(tmp_path), always_fail, num_threads=1,
                       items_per_thread=10000, max_consecutive_failures=3)
    stats = s.scrape(["x"])
    assert stats.errors == 3 and stats.new_total == 0


def test_scraper_hostile_keyword_stays_inside_out_dir(tmp_path):
    """Keywords containing path separators must not create directories
    outside out_dir (ADVICE round 1)."""
    payload = ('{"data":[{"images":{"original":{'
               '"mp4":"https:\\/\\/media.giphy.com\\/media\\/zzz9\\/giphy.mp4"}}}]}')

    def fetch(url):
        return payload.encode() if "search" in url else b"MP4"

    out = tmp_path / "out"
    out.mkdir()
    s = scrape.Scraper(str(out), fetch, num_threads=1, items_per_thread=10)
    s.scrape(["../escape", "a/b", "  "])
    entries = set()
    for root, dirs, files in os.walk(tmp_path):
        for d in dirs:
            entries.add(os.path.relpath(os.path.join(root, d), tmp_path))
    assert not (tmp_path / "escape").exists()
    assert all(e == "out" or e.startswith("out" + os.sep) for e in entries)
    # everything landed under sanitized slugs inside out/
    assert (out / "__escape").exists() or (out / "escape").exists() or \
        any(p.name.endswith("escape") for p in out.iterdir())


def test_clip_batches_from_files_worker_pool(tmp_path):
    """Worker-pool decode: correct shapes/normalization, failed decodes
    skipped with backfill, deterministic under a fixed seed."""
    from gifgan_tpu.data import native_gif
    from gifgan_tpu.data.loader import clip_batches_from_files
    from gifgan_tpu.data.synthetic import synthetic_clip

    if not native_gif.available():
        pytest.skip("native codec not built")
    paths = []
    for i in range(9):
        p = str(tmp_path / f"c{i}.gif")
        native_gif.encode_gif(p, synthetic_clip(i, length=6, size=32))
        paths.append(p)
    bad = str(tmp_path / "bad.gif")
    open(bad, "wb").write(b"not a gif")
    paths.insert(3, bad)

    errs = []
    batches = list(clip_batches_from_files(
        paths, batch_size=4, length=6, size=32, workers=3, shuffle=False,
        seed=0, on_error=lambda p, e: errs.append(p)))
    assert len(batches) == 2              # 9 good clips -> 2 full batches
    assert batches[0].shape == (4 * 6, 32, 32, 3)
    assert batches[0].dtype == np.float32
    assert batches[0].min() >= -1.0 and batches[0].max() <= 1.0
    assert errs == [bad]

    # unfolded layout
    b2 = next(iter(clip_batches_from_files(
        paths, batch_size=2, length=6, size=32, workers=2, shuffle=False,
        fold_time=False, normalize=False)))
    assert b2.shape == (2, 6, 32, 32, 3) and b2.dtype == np.uint8

    # seeded shuffle is reproducible
    a = [b.sum() for b in clip_batches_from_files(
        paths, 4, 6, 32, workers=3, shuffle=True, seed=5)]
    b = [b.sum() for b in clip_batches_from_files(
        paths, 4, 6, 32, workers=1, shuffle=True, seed=5)]
    np.testing.assert_allclose(a, b)


def test_device_corpus_matmul_matches_take():
    """DeviceCorpus MXU formulation (one-hot @ bf16 corpus) is bit-exact
    vs the jnp.take gather: uint8 values are exact in bf16 and the
    contraction touches a single 1 per row."""
    from gifgan_tpu.data.device import DeviceCorpus

    rng = np.random.default_rng(0)
    corpus = rng.integers(0, 256, (37, 4, 6, 6, 3), np.uint8)
    idx = rng.integers(0, 37, (5, 3))
    a = np.asarray(DeviceCorpus(corpus, method="matmul").sample(idx))
    b = np.asarray(DeviceCorpus(corpus, method="take").sample(idx))
    assert a.shape == (5, 3, 4, 6, 6, 3) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)
    # scaling: uint8 255 -> 1.0, 0 -> -1.0
    assert a.max() <= 1.0000002 and a.min() >= -1.0000002
    np.testing.assert_allclose(
        a[0, 0], corpus[idx[0, 0]].astype(np.float32) / 127.5 - 1.0,
        rtol=2e-5)   # XLA folds /127.5 into mul-by-reciprocal


def test_device_corpus_fold_sample_value_exact():
    """fold_sample_fn: time-folded output equals sample() followed by the
    caller-side fold for all three methods — same ints, same scale formula;
    the only permitted slack is XLA's per-program division->reciprocal
    folding (<=2e-5, the tolerance the matmul-vs-take parity above holds
    to). bf16 out_dtype equals one f32->bf16 rounding of those values (the
    conversion the bf16 conv input pays anyway)."""
    import jax.numpy as jnp

    from gifgan_tpu.data.device import DeviceCorpus

    rng = np.random.default_rng(2)
    corpus = rng.integers(0, 256, (23, 4, 8, 8, 3), np.uint8)
    idx = jnp.asarray(rng.integers(0, 23, (6,)), jnp.int32)
    for method in ("matmul", "take", "pallas"):
        c = DeviceCorpus(corpus, method=method)
        want = np.asarray(c.sample(idx)).reshape(6 * 4, 8, 8, 3)
        got = np.asarray(c.fold_sample_fn(c.data, idx))
        assert got.shape == (24, 8, 8, 3) and got.dtype == np.float32
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5,
                                   err_msg=method)
    c = DeviceCorpus(corpus, method="matmul")
    bf = np.asarray(c.fold_sample_fn(c.data, idx, out_dtype=jnp.bfloat16)
                    .astype(jnp.float32))
    want = np.asarray(c.sample(idx)).reshape(6 * 4, 8, 8, 3)
    np.testing.assert_allclose(
        bf, np.asarray(jnp.asarray(want).astype(jnp.bfloat16)
                       .astype(jnp.float32)), rtol=4e-3, atol=4e-3)
    # unit range keeps the late-scale path too
    cu = DeviceCorpus(corpus, method="matmul", out_range="unit")
    wantu = np.asarray(cu.sample(idx)).reshape(6 * 4, 8, 8, 3)
    np.testing.assert_allclose(
        np.asarray(cu.fold_sample_fn(cu.data, idx)), wantu,
        rtol=2e-5, atol=2e-5)
    # frame-major resident layout: same values from both entry points
    want = np.asarray(DeviceCorpus(corpus, method="take").sample(idx))
    cf = DeviceCorpus(corpus, method="matmul", layout="frames")
    np.testing.assert_allclose(np.asarray(cf.sample(idx)), want,
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(cf.fold_sample_fn(cf.data, idx)),
        want.reshape(6 * 4, 8, 8, 3), rtol=2e-5, atol=2e-5)
    import pytest

    with pytest.raises(ValueError, match="frames"):
        DeviceCorpus(corpus, method="take", layout="frames")


def test_train_chunk_ids_accepts_folded_sampler(key):
    """train_chunk_ids with DeviceCorpus.fold_sample_fn (already-folded
    (B*T, ...) frames) computes the same losses as with sample_fn."""
    import jax
    import jax.numpy as jnp

    from gifgan_tpu.core.config import DCGANConfig, TrainConfig, VidGANConfig
    from gifgan_tpu.data.device import DeviceCorpus
    from gifgan_tpu.train import vid as vid_train

    img = DCGANConfig(output_size=32, c_dim=1, z_dim=12, gf_dim=8, df_dim=8)
    cfg = VidGANConfig(z_input_size=16, z_output_size=12, vid_length=4,
                       hidden_dim=16, d_filters=8, image_gan=img)
    tcfg = TrainConfig(batch_size=4, disc_updates=1, gen_updates=1)
    rng = np.random.default_rng(3)
    corpus = DeviceCorpus(rng.integers(0, 256, (16, 4, 32, 32, 1), np.uint8))
    ids = jnp.asarray(rng.integers(0, 16, (2, 4)), jnp.int32)
    z = jnp.asarray(rng.uniform(-1, 1, (2, 4, 16)), jnp.float32)

    ts1 = vid_train.init_train_state(key, cfg, tcfg)
    ts1, m1 = vid_train.train_chunk_ids(ts1, ids, z, jax.random.PRNGKey(5),
                                        corpus.data, cfg, tcfg,
                                        sample_fn=corpus.sample_fn)
    ts2 = vid_train.init_train_state(key, cfg, tcfg)
    ts2, m2 = vid_train.train_chunk_ids(ts2, ids, z, jax.random.PRNGKey(5),
                                        corpus.data, cfg, tcfg,
                                        sample_fn=corpus.fold_sample_fn)
    for k in m1:
        np.testing.assert_allclose(np.asarray(m2[k]), np.asarray(m1[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_device_corpus_pallas_matches_take():
    """Pallas scalar-prefetch gather (kernels/gather.py) matches jnp.take
    exactly, including the non-tile-multiple item padding path and take's
    out-of-range index clamp."""
    from gifgan_tpu.data.device import DeviceCorpus

    rng = np.random.default_rng(1)
    corpus = rng.integers(0, 256, (19, 4, 6, 6, 3), np.uint8)  # D=432, pads
    idx = rng.integers(0, 19, (4, 3))
    a = np.asarray(DeviceCorpus(corpus, method="pallas").sample(idx))
    b = np.asarray(DeviceCorpus(corpus, method="take").sample(idx))
    assert a.shape == (4, 3, 4, 6, 6, 3) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)


def test_gather_rows_scaled_aligned_and_clamped():
    import jax.numpy as jnp

    from gifgan_tpu.kernels.gather import gather_rows_scaled

    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, (7, 4096), np.uint8)  # exactly one u8 tile
    idx = np.array([3, 0, 6, 3, 99, -2], np.int32)    # dup + out-of-range
    got = np.asarray(gather_rows_scaled(
        jnp.asarray(data), jnp.asarray(idx), interpret=True))
    want = data[np.clip(idx, 0, 6)].astype(np.float32) / 127.5 - 1.0
    # 1-ulp: XLA folds /127.5 into mul-by-reciprocal under jit
    np.testing.assert_allclose(got, want, rtol=2e-5)

    import pytest

    with pytest.raises(ValueError):
        gather_rows_scaled(jnp.zeros((4, 128), jnp.uint8),
                           jnp.zeros((2,), jnp.int32), interpret=True)
    with pytest.raises(ValueError):
        gather_rows_scaled(jnp.zeros((4, 4096), jnp.float32),
                           jnp.zeros((2,), jnp.int32), interpret=True)


def test_device_corpus_rejects_bad_input():
    from gifgan_tpu.data.device import DeviceCorpus

    import pytest

    with pytest.raises(ValueError):
        DeviceCorpus(np.zeros((4, 2, 2), np.float32))
    with pytest.raises(ValueError):
        DeviceCorpus(np.zeros((4, 2, 2), np.uint8), method="scatter")


def test_device_corpus_unit_range():
    """out_range='unit' returns [0,1] frames bit-matching the host scale —
    the recurrent family's convention (frames in [0,1], not [-1,1])."""
    import pytest

    from gifgan_tpu.data.device import DeviceCorpus

    corpus_u8 = np.random.default_rng(0).integers(
        0, 256, (8, 3, 4, 4, 1), np.uint8)
    dc = DeviceCorpus(corpus_u8, method="take", out_range="unit")
    ids = np.array([5, 0, 7])
    got = np.asarray(dc.sample(ids))
    np.testing.assert_allclose(
        got, corpus_u8[ids].astype(np.float32) / 255.0, rtol=0, atol=1e-7)
    assert got.min() >= 0.0 and got.max() <= 1.0

    dm = DeviceCorpus(corpus_u8, method="matmul", out_range="unit")
    np.testing.assert_allclose(np.asarray(dm.sample(ids)), got,
                               rtol=0, atol=1e-6)

    with pytest.raises(ValueError, match="pallas"):
        DeviceCorpus(corpus_u8.reshape(8, -1), method="pallas",
                     out_range="unit")
