"""Per-step corpus-gather cost at the flagship endurance shape.

The in-scan gather (train/vid.py train_chunk_ids) adds one DeviceCorpus
sample per optimizer step; this measures that marginal cost per method on
the real chip so the endurance default is chosen from data, not vibes.
Shape: 4,096-clip corpus of (16, 64, 64, 3) uint8 (805 MB resident),
(B=64,) ids per step — the endurance config.

Usage: python examples/corpus_sampler_bench.py [--clips 4096] [--iters 50]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clips", type=int, default=4096)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--methods", default="take,matmul,pallas")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gifgan_tpu.core.cache import enable_compile_cache
    from gifgan_tpu.data.device import DeviceCorpus

    enable_compile_cache()
    rng = np.random.default_rng(0)
    corpus_u8 = rng.integers(0, 256, (args.clips, 16, 64, 64, 3), np.uint8)
    ids = jnp.asarray(rng.integers(0, args.clips, (args.batch,)), jnp.int32)

    ref = None
    for method in args.methods.split(","):
        dc = DeviceCorpus(corpus_u8, method=method)
        out = dc.sample(ids)
        got = np.asarray(out)
        if ref is None:
            ref = got
        else:
            np.testing.assert_array_equal(got, ref)  # parity across methods
        # steady state: all iters dispatch asynchronously and ONE scalar
        # fetch drains the whole pipeline (scalar fetch because the relay
        # under-reports block_until_ready — CLAUDE.md), so this measures
        # amortized pipelined throughput, not per-call latency
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = dc.sample(ids)
        _ = float(np.asarray(out[0, 0, 0, 0, 0]))
        dt = (time.perf_counter() - t0) / args.iters
        gb = args.batch * 16 * 64 * 64 * 3 * 4 / 1e9
        print(f"{method:8s} {dt * 1e3:8.2f} ms/step "
              f"({gb / dt:.1f} GB/s effective)", flush=True)
        del dc


if __name__ == "__main__":
    main()
