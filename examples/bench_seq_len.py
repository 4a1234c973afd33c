"""Sequence-length growth bench: train_chunk throughput at T=16/32/64.

The `seq` mesh axis exists so clips longer than the reference's 16 frames
can shard over ICI (SURVEY §5.7); the round-4 verdict asked for the growth
path to be DEMONSTRATED, not asserted (item 6). This measures the flagship
train step at vid_length 16/32/64 on the real chip — batch scaled so the
folded frame batch (B*T) stays 1024, i.e. constant conv work per step in
the per-frame image stack; what grows is the vid-D's conv3d time extent
and the per-clip latent MLP width. Results are tabled in docs/SCALING.md
next to the T=64 dp x sp dryrun line (loss parity on the virtual mesh).

Usage: python examples/bench_seq_len.py [--lengths 16,32,64] [--chunk 10]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lengths", default="16,32,64")
    p.add_argument("--chunk", type=int, default=10)
    p.add_argument("--folded-batch", type=int, default=1024,
                   help="B*T held constant across lengths")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from gifgan_tpu.core.cache import enable_compile_cache
    from gifgan_tpu.core.config import DCGANConfig, TrainConfig, VidGANConfig
    from gifgan_tpu.train import vid as vid_train

    enable_compile_cache()
    results = []
    for t_len in [int(x) for x in args.lengths.split(",")]:
        b = args.folded_batch // t_len
        img = DCGANConfig(output_size=64, c_dim=3, z_dim=100,
                          compute_dtype=args.dtype)
        cfg = VidGANConfig(z_input_size=120, z_output_size=100,
                           vid_length=t_len, image_gan=img,
                           first_frame_loss_scalar=1.0,
                           compute_dtype=args.dtype)
        tcfg = TrainConfig(batch_size=b, disc_updates=1, gen_updates=2)
        K = args.chunk

        ts = vid_train.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
        frames = jnp.zeros((K, b * t_len, 64, 64, 3), jnp.float32)
        z = jax.random.uniform(jax.random.PRNGKey(1),
                               (K, b, cfg.z_input_size),
                               minval=-1.0, maxval=1.0)
        # warm (compile)
        t0 = time.perf_counter()
        ts, m = vid_train.train_chunk(ts, frames, z, jax.random.PRNGKey(2),
                                      cfg, tcfg)
        float(np.asarray(m["d_loss"][-1]))       # relay-safe sync
        compile_s = time.perf_counter() - t0

        best = 0.0
        for r in range(args.reps):
            t0 = time.perf_counter()
            ts, m = vid_train.train_chunk(ts, frames, z,
                                          jax.random.PRNGKey(3 + r),
                                          cfg, tcfg)
            float(np.asarray(m["d_loss"][-1]))
            dt = time.perf_counter() - t0
            best = max(best, K / dt)
        mem = None
        try:
            stats = jax.local_devices()[0].memory_stats()
            mem = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
        except Exception:
            pass
        rec = {"vid_length": t_len, "batch": b, "chunk": K,
               "steps_per_s": round(best, 2),
               "clips_per_s": round(best * b, 1),
               "frames_per_s": round(best * b * t_len, 0),
               "peak_hbm_gib": mem,
               "first_dispatch_s": round(compile_s, 1)}
        print(json.dumps(rec), flush=True)
        results.append(rec)
    print(json.dumps({"table": results}))


if __name__ == "__main__":
    main()
