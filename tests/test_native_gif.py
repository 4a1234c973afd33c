"""Native C++ GIF codec tests: cross-decoder validation against PIL/imageio,
roundtrips, error paths, and speed sanity."""

import io
import os
import time

import numpy as np
import pytest

from gifgan_tpu.data import native_gif
from gifgan_tpu.data.synthetic import synthetic_clip

pytestmark = pytest.mark.skipif(not native_gif.available(),
                                reason="native codec not built")


def test_roundtrip_noise_all_widths():
    """Noise at several sizes exercises every LZW code width + dict clears;
    PIL must decode our stream identically to our decoder."""
    imageio = pytest.importorskip("imageio.v2")
    rng = np.random.default_rng(0)
    for size in (16, 32, 64, 128):
        img = rng.integers(0, 255, (2, size, size, 3), dtype=np.uint8)
        data = native_gif.encode_gif_bytes(img, fps=10)
        assert data[:6] == b"GIF89a"
        ours = native_gif.decode_gif_bytes(data)
        theirs = np.asarray(imageio.mimread(io.BytesIO(data)))[..., :3]
        np.testing.assert_array_equal(ours, theirs)


def test_decode_imageio_written_gif():
    imageio = pytest.importorskip("imageio.v2")
    clip = synthetic_clip(0, length=5, size=40)
    buf = io.BytesIO()
    imageio.mimwrite(buf, list(clip), format="GIF", duration=100, loop=0)
    ours = native_gif.decode_gif_bytes(buf.getvalue())
    assert ours.shape == (5, 40, 40, 3)
    assert np.abs(ours.astype(int) - clip.astype(int)).mean() < 2.0


def test_quantization_quality():
    clip = synthetic_clip(1, length=4, size=48)
    back = native_gif.decode_gif_bytes(native_gif.encode_gif_bytes(clip))
    # fixed 256-color palette: mean error bounded by bin width
    assert np.abs(back.astype(int) - clip.astype(int)).mean() < 20


def test_atomic_file_write(tmp_path):
    clip = synthetic_clip(2, length=3, size=24)
    p = str(tmp_path / "x.gif")
    native_gif.encode_gif(p, clip, atomic=True)
    assert os.path.exists(p)
    assert not os.path.exists(p + ".tmp.gif")
    assert native_gif.decode_gif(p).shape == (3, 24, 24, 3)


def test_error_paths():
    with pytest.raises(ValueError):
        native_gif.decode_gif_bytes(b"not a gif at all")
    with pytest.raises(ValueError):
        native_gif.encode_gif_bytes(np.zeros((4, 4), np.uint8))  # bad shape


def test_speed_vs_imageio():
    imageio = pytest.importorskip("imageio.v2")
    clip = synthetic_clip(3, length=16, size=64)
    t0 = time.perf_counter()
    for _ in range(5):
        data = native_gif.encode_gif_bytes(clip)
    native_t = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(5):
        buf = io.BytesIO()
        imageio.mimwrite(buf, list(clip), format="GIF", duration=100, loop=0)
    imageio_t = (time.perf_counter() - t0) / 5
    # the native path should never be slower than the Python stack
    assert native_t < imageio_t * 1.5, (native_t, imageio_t)


def test_frame_data_ending_exactly_at_subblock_boundary():
    """Regression: when a frame's pixel codes end exactly at a sub-block
    boundary, the EOI code lives in a *following* sub-block. The decoder
    must still consume that sub-block + the 0x00 terminator, or the next
    byte is misparsed as a block type and all later frames are dropped
    (happens on ~1/255 of real frames that fill a 255-byte sub-block)."""
    import struct

    def u16(v):
        return struct.pack("<H", v)

    def pack_codes(codes, nbits):
        val = 0
        for i, c in enumerate(codes):
            val |= c << (nbits * i)
        total_bits = nbits * len(codes)
        nbytes = (total_bits + 7) // 8
        return val.to_bytes(nbytes, "little")

    clear, eoi = 4, 5  # min_code_size=2
    # frame 1: clear before every pixel keeps code width at 3 bits;
    # 8 codes x 3 bits = 24 bits = exactly 3 bytes -> pixel data fills
    # sub-block 1 exactly; EOI goes in its own sub-block 2.
    f1_codes = [clear, 0, clear, 1, clear, 2, clear, 3]
    f1_data = pack_codes(f1_codes, 3)
    assert len(f1_data) == 3
    f1_blocks = bytes([3]) + f1_data + bytes([1]) + pack_codes([eoi], 3) + b"\x00"
    # frame 2: ordinary single sub-block with EOI inline
    f2_codes = [clear, 3, clear, 2, clear, 1, clear, 0, eoi]
    f2_data = pack_codes(f2_codes, 3)
    f2_blocks = bytes([len(f2_data)]) + f2_data + b"\x00"

    palette = bytes(v for i in range(4) for v in (i * 80, i * 80, i * 80))
    img_desc = b"\x2c" + u16(0) + u16(0) + u16(2) + u16(2) + b"\x00"
    gif = (b"GIF89a" + u16(2) + u16(2) + bytes([0x91, 0, 0]) + palette
           + img_desc + bytes([2]) + f1_blocks
           + img_desc + bytes([2]) + f2_blocks
           + b"\x3b")

    frames = native_gif.decode_gif_bytes(gif)
    assert frames.shape == (2, 2, 2, 3), frames.shape
    np.testing.assert_array_equal(frames[0, ..., 0], [[0, 80], [160, 240]])
    np.testing.assert_array_equal(frames[1, ..., 0], [[240, 160], [80, 0]])


# ---------------------------------------------------------------------------
# fuzz corpus (round-1 verdict item 6: the sub-block-exact pixel-cap bug
# fixed in d19040e is the class of bug that silently corrupts the
# eval/track_rate quality metric; this corpus is the committed regression
# gate against that class)
# ---------------------------------------------------------------------------

def _fuzz_corpus():
    """Deterministic corpus: truncations, bit flips, pathological headers."""
    rng = np.random.default_rng(0xF022)
    base = native_gif.encode_gif_bytes(
        np.random.default_rng(7).integers(0, 255, (3, 24, 24, 3), np.uint8),
        fps=10)
    cases = []
    # every truncation of the first 256 bytes, then strided through the rest
    for i in range(0, min(256, len(base))):
        cases.append(base[:i])
    for i in range(256, len(base), 97):
        cases.append(base[:i])
    # single-byte mutations across the whole stream
    for _ in range(300):
        b = bytearray(base)
        b[rng.integers(0, len(b))] ^= 1 << rng.integers(0, 8)
        cases.append(bytes(b))
    # random garbage with a plausible magic
    for n in (0, 1, 6, 13, 64, 1024):
        cases.append(b"GIF89a" + bytes(rng.integers(0, 256, n, np.uint8)))
    # pathological headers: huge logical screen, zero dims, absurd LZW
    # min code sizes, sub-blocks claiming more pixels than w*h
    b = bytearray(base)
    b[6:10] = b"\xff\xff\xff\xff"          # 65535 x 65535 screen
    cases.append(bytes(b))
    b = bytearray(base)
    b[6:10] = b"\x00\x00\x00\x00"          # 0 x 0 screen
    cases.append(bytes(b))
    for mcs in (0, 1, 11, 12, 255):
        b = bytearray(base)
        idx = b.find(b"\x2c")              # first image descriptor
        if idx >= 0 and idx + 10 < len(b):
            b[idx + 10] = mcs              # lzw min code size byte
            cases.append(bytes(b))
    return cases


def test_fuzz_corpus_decode_no_crash_bounded_output():
    """Every corpus case must either raise ValueError (clean rejection) or
    return a bounded uint8 array — never crash, hang, or return shapes
    inconsistent with the header."""
    for i, data in enumerate(_fuzz_corpus()):
        try:
            arr = native_gif.decode_gif_bytes(data, max_frames=64)
        except ValueError:
            continue
        assert arr.dtype == np.uint8, i
        assert arr.ndim == 4 and arr.shape[3] == 3, (i, arr.shape)
        n, h, w, _ = arr.shape
        assert 0 < n <= 64 and 0 < h <= 65535 and 0 < w <= 65535, \
            (i, arr.shape)


def test_fuzz_corpus_under_asan():
    """Run the same corpus through the ASan/UBSan-instrumented driver
    (native/gif_fuzz_asan): any OOB read/write or UB aborts. Builds the
    driver on demand; skips only if the toolchain can't produce it."""
    import subprocess
    native_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native")
    drv = os.path.join(native_dir, "gif_fuzz_asan")
    if not os.path.exists(drv):
        r = subprocess.run(["make", "-C", native_dir, "fuzz"],
                           capture_output=True)
        if r.returncode != 0 or not os.path.exists(drv):
            pytest.skip("asan fuzz driver not buildable here")
    for i, data in enumerate(_fuzz_corpus()):
        r = subprocess.run([drv], input=data, capture_output=True,
                           timeout=30)
        assert r.returncode == 0, (
            i, r.returncode, r.stderr.decode(errors="replace")[-2000:])
