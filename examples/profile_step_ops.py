"""Per-op device-time breakdown of the flagship train step.

Captures a jax.profiler trace of one train_chunk dispatch at the reference
flagship shape and prints where the device time actually goes (op table +
category totals), plus the FLOP-derived average MXU efficiency. This is the
evidence base for the PROFILE.md speed-of-light argument: ops in non-matmul
categories (copies/transposes/elementwise not fused into a conv) bound what
any hand kernel could reclaim; conv time vs the cost-analysis FLOPs bounds
how far the convs themselves sit from peak.

Usage:
  python examples/profile_step_ops.py                 # real TPU, flagship
  python examples/profile_step_ops.py --platform cpu --batch 4 --chunk 2
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--chunk", type=int, default=5,
                   help="steps per traced dispatch (small keeps the trace "
                        "readable; per-step cost matches K=20 within 7%)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--trace-dir", default="/tmp/flagship_trace")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="bf16 peak of the target chip (v5e: 197)")
    p.add_argument("--endurance", action="store_true",
                   help="profile the PRODUCTION program instead of the lean "
                        "bench one: train_chunk_ids (in-scan DeviceCorpus "
                        "gather) + traced Knobs at the endurance-4 noise "
                        "levels (0.5/0.5) — the round-4 verdict's "
                        "unaccounted ~8 ms/step lives here, not in the "
                        "bench step")
    p.add_argument("--corpus-clips", type=int, default=4096)
    p.add_argument("--no-knobs", action="store_true",
                   help="(with --endurance) drop the knobs pytree to "
                        "isolate knob-plumbing cost from the corpus gather")
    p.add_argument("--fold-gather", action="store_true",
                   help="(with --endurance) use DeviceCorpus.fold_sample_fn "
                        "— fold time into batch on the 1-byte resident "
                        "dtype, scale after (the round-5 formatting fix)")
    p.add_argument("--gather-dtype", default=None, choices=["bfloat16"],
                   help="(with --fold-gather) emit frames in bf16: noise "
                        "then draws in bf16 too (ops/nn.add_noise uses "
                        "x.dtype), halving the uniform->normal transform")
    p.add_argument("--corpus-layout", default="clips",
                   choices=["clips", "frames"],
                   help="DeviceCorpus resident layout: 'frames' (T, N, F) "
                        "turns the fold into a cheap row-permutation "
                        "transpose instead of the measured-hot reshape")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from gifgan_tpu.core.cache import enable_compile_cache
    from gifgan_tpu.core.config import (DCGANConfig, TrainConfig,
                                        VidGANConfig)
    from gifgan_tpu.core.profile import summarize_trace, trace
    from gifgan_tpu.train import vid as vid_train

    enable_compile_cache()
    img = DCGANConfig(output_size=64, c_dim=3, z_dim=100,
                      compute_dtype=args.dtype)
    cfg = VidGANConfig(z_input_size=120, z_output_size=100, vid_length=16,
                       image_gan=img, first_frame_loss_scalar=1.0,
                       compute_dtype=args.dtype)
    tcfg = TrainConfig(batch_size=args.batch, disc_updates=1, gen_updates=2)
    B, T, K = args.batch, cfg.vid_length, args.chunk

    ts = vid_train.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    z = jax.random.uniform(jax.random.PRNGKey(1), (K, B, cfg.z_input_size),
                           minval=-1.0, maxval=1.0)

    if args.endurance:
        # the ENDURANCE program: ids gathered from a device-resident corpus
        # inside the scan body + runtime knobs at the endurance-4 levels
        from gifgan_tpu.data.device import DeviceCorpus
        from gifgan_tpu.data.synthetic import synthetic_clips

        corpus = DeviceCorpus(synthetic_clips(args.corpus_clips, length=T,
                                              size=64),
                              layout=args.corpus_layout)
        ids = jnp.asarray(np.random.default_rng(3).integers(
            0, args.corpus_clips, (K, B)), jnp.int32)
        knobs = (None if args.no_knobs
                 else vid_train.make_knobs(cfg, image_noise_std=0.5,
                                           activation_noise_std=0.5,
                                           d_lr_scale=1.0))
        if args.fold_gather:
            import functools

            out_dtype = jnp.bfloat16 if args.gather_dtype else None
            sample_fn = functools.partial(corpus.fold_sample_fn,
                                          out_dtype=out_dtype)
        else:
            sample_fn = corpus.sample_fn
        run = lambda ts: vid_train.train_chunk_ids(
            ts, ids, z, jax.random.PRNGKey(2), corpus.data, cfg, tcfg,
            sample_fn=sample_fn, knobs=knobs)
        lowered = vid_train.train_chunk_ids.lower(
            ts, ids, z, jax.random.PRNGKey(2), corpus.data, cfg, tcfg,
            sample_fn=sample_fn, knobs=knobs)
    else:
        frames = jnp.zeros((K, B * T, 64, 64, 3), jnp.float32)
        run = lambda ts: vid_train.train_chunk(
            ts, frames, z, jax.random.PRNGKey(2), cfg, tcfg)
        lowered = vid_train.train_chunk.lower(ts, frames, z,
                                              jax.random.PRNGKey(2), cfg,
                                              tcfg)

    # compile + warm outside the capture (train_chunk donates ts — chain it)
    cost = lowered.compile().cost_analysis()
    flops_chunk = float(cost.get("flops", 0.0))
    ts, m = run(ts)
    float(np.asarray(m["d_loss"][-1]))

    with trace(args.trace_dir):
        ts, m = run(ts)
        float(np.asarray(m["d_loss"][-1]))      # relay-safe sync

    s = summarize_trace(args.trace_dir, top=args.top)
    step_us = s["total_us"] / K
    print(f"\ndevice time: {s['total_us']:.0f} us total, "
          f"{step_us:.0f} us/step (K={K})")
    if flops_chunk:
        tflops = flops_chunk / (s["total_us"] * 1e-6) / 1e12
        print(f"cost-analysis FLOPs: {flops_chunk/1e9:.1f} GF/chunk -> "
              f"{tflops:.1f} TFLOP/s = "
              f"{100 * tflops / args.peak_tflops:.1f}% of "
              f"{args.peak_tflops:.0f} TFLOP/s peak")
    print("\nby category (us, % of device time):")
    for cat, us in s["by_category"].items():
        print(f"  {us:12.1f}  {100 * us / s['total_us']:5.1f}%  {cat}")
    print(f"\ntop {args.top} ops:")
    for name, us, pct in s["ops"]:
        print(f"  {us:12.1f}  {pct:5.1f}%  {name}")

    out = {"total_us": s["total_us"], "step_us": step_us, "K": K,
           "flops_chunk": flops_chunk, "by_category": s["by_category"],
           "ops": s["ops"]}
    with open(os.path.join(args.trace_dir, "summary.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {args.trace_dir}/summary.json")


if __name__ == "__main__":
    main()
