"""Control experiment: is the int8 track-rate drop a quantizer problem or
a metric cliff?

docs/SERVING.md's quality matrix shows full-int8 serving costs ~12-20
points of face track-rate on the healthy endurance-3 checkpoint while PSNR
(~36 dB) and FAD (<=0.008) stay excellent. This script adds uniform u8
noise of amplitude ±1..3/255 to the FLOAT path's own frames — the same
256 clips, the same detector (eval/track_rate.py, the reference
consistency_experiment methodology) — and measures the rate. If a
human-invisible ±1/255 dither also craters the metric, the int8 result is
explained by detector brittleness near the decision margin (any ~1-2/255
perturbation flips borderline per-frame detections, and the 16-frame
tracking chain amplifies flips into lost clips), not by quantization
degrading the generator.

Measured 2026-08-19 (endurance-3 checkpoint, n=256): float 89.8%,
±1/255 78.9%, ±2/255 77.0%, ±3/255 74.2% — the int8 static-calib variant
(77.7%, MAE 2.0/255) sits exactly at its noise-equivalent.

Usage:
    python examples/track_rate_noise_control.py \
        --checkpoint runs/endurance3/checkpoints [--clips 256] [--cpu]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--clips", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--amps", default="1,2,3",
                    help="comma-separated uniform noise amplitudes (u8)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cascade", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gifgan_tpu.core import checkpoint as ckpt
    from gifgan_tpu.core.cache import enable_compile_cache
    from gifgan_tpu.core.config import (DCGANConfig, TrainConfig,
                                        VidGANConfig)
    from gifgan_tpu.eval.track_rate import EVAL_TRACK_CONFIG, face_track_rate
    from gifgan_tpu.track.detect import default_detector, find_default_cascade
    from gifgan_tpu.train import vid as vid_train

    enable_compile_cache()
    img = DCGANConfig(output_size=64, c_dim=3, z_dim=100,
                      compute_dtype=args.dtype)
    cfg = VidGANConfig(z_input_size=120, z_output_size=100, vid_length=16,
                       image_gan=img, first_frame_loss_scalar=1.0,
                       compute_dtype=args.dtype)
    ts = vid_train.init_train_state(jax.random.PRNGKey(0), cfg,
                                    TrainConfig(batch_size=args.batch))
    ts = vid_train.VidTrainState(**ckpt.restore(args.checkpoint,
                                                ts._asdict()))
    det = default_detector(cascade_path=args.cascade or
                           find_default_cascade(),
                           min_neighbors=2, min_size=20)

    def track(clips_u8):
        ups = np.repeat(np.repeat(clips_u8, 2, 2), 2, 3)  # eval 2x upscale
        return face_track_rate(list(ups), det, EVAL_TRACK_CONFIG)["tracked"]

    amps = [int(a) for a in args.amps.split(",") if a]
    rng = np.random.default_rng(0)
    counts = {"float": 0, **{f"noise{a}": 0 for a in amps}}
    tot = 0
    for i in range(0, args.clips, args.batch):
        # same z recipe as examples/int8_quality_eval.py: paired with the
        # quality matrix's float row
        z = jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(7), i),
                               (args.batch, cfg.z_input_size),
                               minval=-1.0, maxval=1.0)
        take = min(args.batch, args.clips - i)
        v = np.asarray(jnp.clip(
            (vid_train.sample_videos(ts, z, cfg) + 1.0) * 127.5,
            0, 255)).astype(np.uint8)[:take]
        tot += take
        counts["float"] += track(v)
        for a in amps:
            n = rng.integers(-a, a + 1, v.shape)
            counts[f"noise{a}"] += track(
                np.clip(v.astype(np.int32) + n, 0, 255).astype(np.uint8))
        print(f"  {tot}/{args.clips}: {counts}", flush=True)

    out = {"clips": tot, "checkpoint": args.checkpoint,
           **{k: round(v / tot, 4) for k, v in counts.items()}}
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
