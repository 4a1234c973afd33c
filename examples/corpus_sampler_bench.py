"""Bench the three DeviceCorpus sampling formulations at the flagship
endurance chunk shape (data/device.py: take / one-hot-matmul / Pallas
scalar-prefetch gather).

The chunk is (K=80, B=64) clip ids over a (N, 16, 64, 64, 3) uint8 corpus
-> a (80, 64, 16, 64, 64, 3) f32 batch (~4 GB). Speed-of-light is HBM
copy: ~1 GB of u8 reads + ~3.9 GB of f32 writes ~= 6 ms on a v5e.

Usage: python examples/corpus_sampler_bench.py [--corpus-clips 1024]
       [--iters 3] [--methods pallas,matmul,take]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus-clips", type=int, default=1024)
    p.add_argument("--chunk", type=int, default=80)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--methods", default="pallas,matmul,take")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    from gifgan_tpu.core.cache import enable_compile_cache
    enable_compile_cache()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from gifgan_tpu.data.device import DeviceCorpus
    from gifgan_tpu.data.synthetic import synthetic_clips

    n, k, b = args.corpus_clips, args.chunk, args.batch
    print(f"[sampler-bench] backend={jax.default_backend()} corpus={n} "
          f"chunk=({k},{b})", flush=True)
    corpus = synthetic_clips(n, length=16, size=64)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, n, (k, b)).astype(np.int32)
    out_gb = k * b * 16 * 64 * 64 * 3 * 4 / 1e9

    for method in args.methods.split(","):
        t0 = time.perf_counter()
        dc = DeviceCorpus(corpus, method=method)
        # sync the upload+widen before timing the samples
        float(np.asarray(dc.sample(np.zeros((1, 1), np.int32))).sum())
        setup_s = time.perf_counter() - t0
        times = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            out = dc.sample(idx)
            # the relay under-reports block_until_ready; sync via scalar
            float(np.asarray(out[0, 0, 0, 0, 0, 0]))
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"  {method:7s} setup {setup_s:6.2f} s   sample "
              f"{best * 1e3:8.1f} ms/chunk  ({out_gb / best:6.1f} GB/s "
              f"produced, {best / k * 1e3:.2f} ms/step-equiv)", flush=True)


if __name__ == "__main__":
    main()
