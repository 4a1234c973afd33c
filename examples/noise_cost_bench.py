"""Attribute the training-vs-bench throughput gap and test cheap TPU RNG.

The endurance run (instance noise 0.1 + activation noise 0.1, reference
z_model_lib.py:84,89 semantics) measured ~25.7 steps/s where the no-noise
bench program measures ~40.6. Candidate costs: (a) the four per-step
threefry noise tensors (two (B*T,64,64,3) + two activation maps), (b) the
per-chunk on-device data gather, (c) nothing — different program luck.

This script measures K-chunked train_chunk steps/s for:
  1. no-noise config (the bench program — compile-cache hit)
  2. noise 0.1/0.1 with the default threefry PRNG key (the endurance
     program — cache hit after an endurance run)
  3. noise 0.1/0.1 with an `rbg` PRNG key — jax.random.key(seed,
     impl="rbg") generates with the TPU-native fast bit generator; the
     key type flows through jax.random.split inside the step, so no
     framework change is needed, only the key passed in
plus the prep gather alone (uint8 corpus -> (K, B*T, s, s, 3) f32).

Usage: python examples/noise_cost_bench.py [--chunk 80] [--steps 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(tag, cfg, tcfg, K, steps, rng_key):
    import jax
    import jax.numpy as jnp

    from gifgan_tpu.train import vid as vid_train

    B, T = tcfg.batch_size, cfg.vid_length
    ts = vid_train.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    frames = jnp.zeros((K, B * T, 64, 64, 3), jnp.float32)
    z = jax.random.uniform(jax.random.PRNGKey(1), (K, B, cfg.z_input_size),
                           minval=-1.0, maxval=1.0)
    t0 = time.time()
    ts, m = vid_train.train_chunk(ts, frames, z, rng_key, cfg, tcfg)
    float(np.asarray(m["d_loss"][-1]))
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(steps):
        ts, m = vid_train.train_chunk(ts, frames, z, rng_key, cfg, tcfg)
        float(np.asarray(m["d_loss"][-1]))
    dt = time.perf_counter() - t0
    sps = steps * K / dt
    print(f"{tag:28s} {sps:7.2f} steps/s ({1e3 * dt / (steps * K):.2f} "
          f"ms/step; first call {compile_s:.0f}s)", flush=True)
    return sps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=80)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--skip-rbg", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gifgan_tpu.core.cache import enable_compile_cache
    from gifgan_tpu.core.config import (DCGANConfig, TrainConfig,
                                        VidGANConfig)

    enable_compile_cache()
    K = args.chunk

    def cfgs(noise):
        img = DCGANConfig(output_size=64, c_dim=3, z_dim=100,
                          compute_dtype="bfloat16", noise_std=noise)
        cfg = VidGANConfig(z_input_size=120, z_output_size=100,
                           vid_length=16, image_gan=img,
                           first_frame_loss_scalar=1.0,
                           compute_dtype="bfloat16",
                           image_noise_std=noise,
                           activation_noise_std=noise)
        return cfg, TrainConfig(batch_size=64, disc_updates=1, gen_updates=2)

    results = {}
    cfg0, tcfg0 = cfgs(0.0)
    results["no_noise_threefry"] = measure(
        "no noise, threefry", cfg0, tcfg0, K, args.steps,
        jax.random.PRNGKey(2))
    cfgN, tcfgN = cfgs(0.1)
    results["noise_threefry"] = measure(
        "noise 0.1, threefry", cfgN, tcfgN, K, args.steps,
        jax.random.PRNGKey(2))
    if not args.skip_rbg:
        results["noise_rbg"] = measure(
            "noise 0.1, rbg key", cfgN, tcfgN, K, args.steps,
            jax.random.key(2, impl="rbg"))

    # prep gather alone (endurance_run.py's on-device prep program)
    B, T = 64, 16
    data = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (4096, T, 64, 64, 3), np.uint8))

    @jax.jit
    def prep(data_u8, idx):
        g = jnp.take(data_u8, idx, axis=0)
        g = g.astype(jnp.float32) / 127.5 - 1.0
        return g.reshape(K, B * T, 64, 64, 3)

    idx = jnp.asarray(np.random.default_rng(1).integers(0, 4096, (K, B)))
    out = prep(data, idx)
    float(np.asarray(out[0, 0, 0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(3):
        out = prep(data, idx)
        float(np.asarray(out[0, 0, 0, 0, 0]))
    prep_ms = (time.perf_counter() - t0) / 3 * 1e3
    print(f"{'prep gather/chunk':28s} {prep_ms:7.1f} ms "
          f"({prep_ms / K:.2f} ms/step-equivalent)", flush=True)
    results["prep_ms_per_chunk"] = prep_ms
    print(results)


if __name__ == "__main__":
    main()
