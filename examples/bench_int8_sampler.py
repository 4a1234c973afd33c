"""Serving-path bench: float (bf16/f32) vs int8 VID_DCGAN sampler.

The sampler (reference model_sampler.py / explorer run_inference) is the
conv-bound inference forward: vid-G MLP + image-G deconv stack over
B clips x T frames. The v5e MXU's int8 path peaks at 2x its bf16 rate;
ops/quant.py folds BN and quantizes weights per-channel / activations
per-tensor so the deconvs run int8 x int8 -> int32.

Usage (real TPU; CPU works for plumbing checks):
    python examples/bench_int8_sampler.py [--batch 64] [--reps 30] [--cpu]

Prints per-variant ms/batch + clip-frames/s and the int8 speedup.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64, help="clips per batch")
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", default="bfloat16",
                    help="float compute dtype (use float32 for CPU checks "
                         "— XLA:CPU emulates bf16 very slowly)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gifgan_tpu.core.cache import enable_compile_cache
    from gifgan_tpu.core.config import (DCGANConfig, TrainConfig,
                                        VidGANConfig)
    from gifgan_tpu.train import vid as vid_train

    enable_compile_cache()

    # flagship serving shape (z_model.py:27-29): 64 clips x 16 frames
    # of 64x64x3, vid z 120 -> img z 100
    img = DCGANConfig(output_size=64, c_dim=3, z_dim=100,
                      compute_dtype=args.dtype)
    cfg = VidGANConfig(z_input_size=120, z_output_size=100, vid_length=16,
                       image_gan=img, compute_dtype=args.dtype)
    ts = vid_train.init_train_state(jax.random.PRNGKey(0), cfg,
                                    TrainConfig(batch_size=args.batch))
    z = jax.random.uniform(jax.random.PRNGKey(1),
                           (args.batch, cfg.z_input_size),
                           minval=-1.0, maxval=1.0)
    frames_per_batch = args.batch * cfg.vid_length

    def sync(out):
        # relay-safe sync that moves ONE scalar: index on device first —
        # np.asarray(out) would ship the whole ~50 MB frames tensor through
        # the ~35 MB/s relay inside the timed region and flatten the
        # int8-vs-float ratio toward 1x
        float(np.asarray(out[0, 0, 0, 0, 0]))

    def measure(fn, label):
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{label:>22}: {dt * 1e3:8.2f} ms/batch  "
              f"{frames_per_batch / dt:10.0f} frames/s")
        return dt

    t_f = measure(lambda: vid_train.sample_videos(ts, z, cfg),
                  f"float ({img.compute_dtype})")

    q, sample_q = vid_train.quantize_sampler(ts, cfg)
    t_q = measure(lambda: sample_q(q, z, cfg), "int8 dynamic")

    qs, _ = vid_train.quantize_sampler(ts, cfg, calib_batches=2,
                                       calib_batch_size=args.batch)
    t_s = measure(lambda: sample_q(qs, z, cfg), "int8 static-calib")

    # mixed precision: tanh output layer kept f32 (the quality-preserving
    # serving variant, docs/SERVING.md — that layer is lane-padded to ~7%
    # MXU peak either way, so the expected cost is small)
    qf, _ = vid_train.quantize_sampler(ts, cfg, calib_batches=2,
                                       calib_batch_size=args.batch,
                                       float_last=True)
    t_fl = measure(lambda: sample_q(qf, z, cfg), "int8 calib float-last")

    print(f"int8 speedup: dynamic {t_f / t_q:.2f}x, "
          f"static {t_f / t_s:.2f}x, "
          f"static float-last {t_f / t_fl:.2f}x")


if __name__ == "__main__":
    main()
