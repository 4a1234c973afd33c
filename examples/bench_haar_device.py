"""Benchmark the TPU device Haar cascade vs the host C++ evaluator.

Measures detectMultiScale-equivalent throughput on a real 16-frame face
clip (reference mturk GIFs upscaled to `--size`), comparing:
  - NativeHaarDetector: C++ early-exit per frame on host
    (native/haarcascade.cpp, the 1-core-host default);
  - DeviceHaarDetector: pyramid-packed gather-free early stages for the
    whole clip in ONE TPU dispatch + C++ host finisher for survivors
    (track/haar_device.py).

Reference behavior being measured: cv2.CascadeClassifier.detectMultiScale
per frame inside the track loop (/root/reference/data_collection/
track_faces.py:260-262).

Usage: python examples/bench_haar_device.py [--size 256] [--frames 16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from gifgan_tpu.cli import _enable_compile_cache  # noqa: E402

CASCADE = "/root/reference/demo/classifier_configs/haarcascade_frontalface_alt2.xml"
FACES = "/root/reference/firebase/public/mturk/nested_dcgan_samples"


def load_clip(frames: int, size: int) -> np.ndarray:
    import imageio.v2 as imageio

    f = sorted(os.listdir(FACES))[0]
    clip = np.stack([np.asarray(x)[..., :3]
                     for x in imageio.mimread(os.path.join(FACES, f))])
    clip = np.concatenate([clip] * (frames // len(clip) + 1))[:frames]
    rep = max(1, size // clip.shape[1])
    big = np.repeat(np.repeat(clip, rep, 1), rep, 2)
    return np.dot(big.astype(np.float64), [0.299, 0.587, 0.114])


def load_mturk_clips(n: int, rep: int = 2):
    """First n mturk sample GIFs as grayscale stacks at `rep`x upscale —
    the REALISTIC input distribution (the eval pipeline upscales the 64px
    samples 2x before tracking, eval/track_rate.py)."""
    import imageio.v2 as imageio

    clips = []
    for f in sorted(os.listdir(FACES))[:n]:
        frames = np.stack([np.asarray(x)[..., :3]
                           for x in imageio.mimread(os.path.join(FACES, f))])
        big = np.repeat(np.repeat(frames, rep, 1), rep, 2)
        clips.append(np.dot(big.astype(np.float64), [0.299, 0.587, 0.114]))
    return clips


def bench_mturk(args):
    """The round-2 verdict item 6 measurement: native per-clip vs device
    per-clip vs device MULTI-CLIP BATCHED (detect_clips, N clips per
    dispatch) on the realistic ~128px mturk distribution where the
    per-clip device path lost (TODO.md: native 38 s vs device 62 s /
    25 clips)."""
    from gifgan_tpu.track.haar import NativeHaarDetector
    from gifgan_tpu.track.haar_device import DeviceHaarDetector

    clips = load_mturk_clips(args.mturk, rep=args.mturk_rep)
    t_all = sum(c.shape[0] for c in clips)
    print(f"{len(clips)} mturk clips, {t_all} frames at "
          f"{clips[0].shape[1]}x{clips[0].shape[2]}")
    native = NativeHaarDetector(CASCADE, min_neighbors=args.min_neighbors)
    device = DeviceHaarDetector(CASCADE, min_neighbors=args.min_neighbors)
    B = args.mturk_batch

    def run_native():
        return [[native.detect_rects(g) for g in c] for c in clips]

    def run_dev_per_clip():
        return [device.detect_batch(c) for c in clips]

    def run_dev_batched():
        out = []
        for i in range(0, len(clips), B):
            out.extend(device.detect_clips(clips[i:i + B]))
        return out

    results = {}
    for name, fn in (("native C++ per-clip", run_native),
                     ("device per-clip", run_dev_per_clip),
                     (f"device batched x{B}", run_dev_batched)):
        fn()  # warm (compiles on first call)
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        dets = sum(len(fr) for c in r for fr in c)
        results[name] = dt
        print(f"{name:24s} {dt:7.2f} s  "
              f"({dt / len(clips) * 1e3:6.0f} ms/clip, {dets} dets)")
    print(f"batched vs native: "
          f"{results['native C++ per-clip'] / results[f'device batched x{B}']:.2f}x")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--min-neighbors", type=int, default=2)
    ap.add_argument("--mturk", type=int, default=0,
                    help="bench on the first N mturk GIFs (the realistic "
                         "small-clip distribution) instead of one upscaled "
                         "clip; compares per-clip vs detect_clips batching")
    ap.add_argument("--mturk-batch", type=int, default=8,
                    help="clips per device dispatch in the batched mode")
    ap.add_argument("--mturk-rep", type=int, default=2,
                    help="integer upscale applied to the 64px samples "
                         "(2 = the eval pipeline's 128px)")
    args = ap.parse_args()

    if args.mturk:
        _enable_compile_cache()
        bench_mturk(args)
        return

    _enable_compile_cache()
    from gifgan_tpu.track.haar import NativeHaarDetector
    from gifgan_tpu.track.haar_device import DeviceHaarDetector

    grays = load_clip(args.frames, args.size)
    t, h, w = grays.shape
    print(f"clip: {t} frames at {h}x{w}")

    native = NativeHaarDetector(CASCADE, min_neighbors=args.min_neighbors)
    device = DeviceHaarDetector(CASCADE, min_neighbors=args.min_neighbors)

    # warm (device path compiles its program on first call)
    rn = [native.detect_rects(g) for g in grays]
    t0 = time.perf_counter()
    rd = device.detect_batch(grays)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.iters):
        rn = [native.detect_rects(g) for g in grays]
    host_s = (time.perf_counter() - t0) / args.iters

    t0 = time.perf_counter()
    for _ in range(args.iters):
        rd = device.detect_batch(grays)
    dev_s = (time.perf_counter() - t0) / args.iters

    n_native = sum(len(r) for r in rn)
    n_device = sum(len(r) for r in rd)
    print(f"native C++ (per-frame): {host_s * 1e3:8.1f} ms/clip  "
          f"{host_s / t * 1e3:6.2f} ms/frame  ({n_native} dets)")
    print(f"device TPU (one dispatch + host finisher): "
          f"{dev_s * 1e3:8.1f} ms/clip  {dev_s / t * 1e3:6.2f} ms/frame  "
          f"({n_device} dets; first-call incl. compile {compile_s:.1f} s)")
    print(f"speedup: {host_s / dev_s:.2f}x")


if __name__ == "__main__":
    main()
