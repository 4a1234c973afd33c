"""Image-DCGAN training throughput at the reference config (main.py:12-17,
model.py:153-156,226-239: batch 64, 64x64x3, z=100, Adam 2e-4 b1 0.5,
1 D + 2 G updates per batch), comparing how the chunk's pixels reach the
chip:

  host:   the host materializes each (K, B, 64, 64, 3) float32 chunk and
          uploads it — the reference's feed_dict pattern. At K=40 that is
          125 MB/chunk; behind the ~35 MB/s axon relay the upload alone
          costs ~3.6 s, dwarfing the math.
  corpus: the uint8 corpus lives in HBM (data/device.py DeviceCorpus) and
          the host ships (K, B) int32 ids — 10 KB/chunk. Same batches,
          same epoch semantics (train/loops.py train_dcgan stills_u8,
          CLI `train-dcgan --device-corpus`).

Prints one JSON line per mode plus a summary. Compile cost is excluded
(warmup chunk) — this measures the steady-state loop.

Usage: python examples/bench_train_dcgan.py [--modes corpus,host]
       [--chunk 40] [--iters 3] [--corpus-size 8192] [--platform cpu]
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
    p.add_argument("--modes", default="corpus,host")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--chunk", type=int, default=40)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--corpus-size", type=int, default=8192)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--platform", default=None)
    p.add_argument("--size", type=int, default=64,
                   help="image size (shrink for CPU smokes)")
    p.add_argument("--gf-dim", type=int, default=64)
    p.add_argument("--df-dim", type=int, default=64)
    args = p.parse_args()

    from gifgan_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from gifgan_tpu.core.config import DCGANConfig, TrainConfig
    from gifgan_tpu.data.device import DeviceCorpus
    from gifgan_tpu.data.synthetic import synthetic_stills
    from gifgan_tpu.train import gan

    cfg = DCGANConfig(output_size=args.size, c_dim=3, z_dim=100,
                      gf_dim=args.gf_dim, df_dim=args.df_dim,
                      compute_dtype=args.dtype)
    tcfg = TrainConfig(batch_size=args.batch, disc_updates=1, gen_updates=2)
    K, B = args.chunk, args.batch

    print(f"[bench] corpus {args.corpus_size} stills, chunk K={K}, B={B}, "
          f"{args.dtype}, backend {jax.default_backend()}", flush=True)
    stills = synthetic_stills(args.corpus_size, size=args.size, channels=3)
    corpus = DeviceCorpus(stills)

    step_fn = jax.jit(lambda ts, im, z, k: gan.train_chunk(
        ts, im, z, k, cfg, tcfg))

    def sync(metrics):
        # relay under-reports block_until_ready; fetch a scalar
        return float(np.asarray(metrics["d_loss"][-1]))

    rng = np.random.default_rng(0)
    results = {}
    for mode in args.modes.split(","):
        ts = gan.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)

        def make_chunk(i):
            ids = rng.integers(0, args.corpus_size, (K, B))
            z = rng.uniform(-1, 1, (K, B, cfg.z_dim)).astype(np.float32)
            if mode == "corpus":
                return corpus.sample(ids), jnp.asarray(z)
            # host path: materialize + upload f32 pixels (feed_dict style)
            im = stills[ids.reshape(-1)].astype(np.float32) / 127.5 - 1.0
            return np.ascontiguousarray(
                im.reshape(K, B, args.size, args.size, 3)), jnp.asarray(z)

        im, z = make_chunk(-1)
        ts, metrics = step_fn(ts, im, z, jax.random.PRNGKey(1))
        sync(metrics)  # compile + warm
        t0 = time.perf_counter()
        for i in range(args.iters):
            im, z = make_chunk(i)
            ts, metrics = step_fn(ts, im, z, jax.random.PRNGKey(2 + i))
            sync(metrics)
        dt = time.perf_counter() - t0
        sps = args.iters * K / dt
        results[mode] = sps
        print(json.dumps({
            "metric": f"dcgan_train_steps_per_sec_b{B}_{args.size}x{args.size}x3_{mode}",
            "value": round(sps, 2), "unit": "steps/sec",
            "chunk": K, "dtype": args.dtype,
            "host_bytes_per_chunk": (K * B * 4 if mode == "corpus"
                                     else K * B * args.size * args.size * 3 * 4),
        }), flush=True)

    if len(results) > 1 and "host" in results and "corpus" in results:
        print(json.dumps({"corpus_vs_host_speedup":
                          round(results["corpus"] / results["host"], 2)}),
              flush=True)


if __name__ == "__main__":
    main()
