"""Kernel-level roofline for the stride-2 deconv stages (round-2 verdict
item 7): is there a Pallas win left in the two mid-stack deconvs that run
at 24% of bf16 peak (docs/PROFILE.md round-4 audit)?

Any kernel for these ops decomposes into two irreducible parts:

  1. the USEFUL MACs — the four output-parity phases of a stride-2 k=5
     deconv touch 9+6+6+4 = 25 taps total (ops/nn.py _deconv2d_subpixel's
     derivation), i.e. the same 25*in*out MACs per input pixel as the
     dilated form counts nominally over 4x the output pixels. A perfect
     kernel cannot do fewer; its floor is F_useful / bf16-peak.
  2. the phase->interleaved LAYOUT conversion (depth-to-space). Mosaic
     rejects (h,w,c)-interleaving reshapes in VMEM (docs/KERNELS.md), so a
     Pallas kernel writes phase-planar output and the interleave runs as a
     separate HBM pass whose floor is read+write bytes / HBM peak. (The
     dilated formulation writes interleaved output directly and never pays
     this.)

This script measures, per flagship stage on the real chip: the dilated
deconv (production path), the dense phase-conv alone, the depth-to-space
alone, the full subpixel composition — and compares the PHYSICAL floor of
the kernel route (max(measured phase conv, MAC floor) + d2s byte floor)
against the measured dilated time. If floor(kernel route) is not
meaningfully below t(dilated), no hand kernel can win — a stronger
statement than any one failed kernel attempt.

Usage: python examples/deconv_roofline.py [--iters 50] [--batch 1024]
Emits one JSON line per stage + a verdict line; paste into PROFILE.md.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BF16_PEAK = 197e12   # v5e MXU bf16 FLOP/s
HBM_PEAK = 819e9     # v5e HBM bytes/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=1024,
                    help="inner image batch (64 clips x 16 frames)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from gifgan_tpu.core.cache import enable_compile_cache
    from gifgan_tpu.ops import nn

    enable_compile_cache()
    b = args.batch
    # the generator's stride-2 stages at the flagship 64px shape
    # (models/dcgan.py: 4x4x512 -> 8x8x256 -> 16x16x128 -> 32x32x64 -> 64x64x3;
    # the c=3 end stage is excluded — its 7% peak is lane padding, not
    # schedulable by any kernel)
    stages = [("4->8", (b, 4, 4, 512), 256),
              ("8->16", (b, 8, 8, 256), 128),
              ("16->32", (b, 16, 16, 128), 64)]
    K = args.iters

    def timed(fn, *xs):
        """Median of 3: K applications inside one jitted fori_loop (host
        dispatch amortized); sync by fetching the scalar result (relay
        gotcha: block_until_ready under-reports)."""

        @jax.jit
        def loop(*xs):
            def body(_, c):
                return c + fn(*xs, c)
            return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

        float(np.asarray(loop(*xs)))  # compile + warm
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(*xs)))
            best.append((time.perf_counter() - t0) / K)
        return float(np.median(best))

    results = []
    for name, xshape, out_ch in stages:
        in_ch = xshape[-1]
        key = jax.random.PRNGKey(0)
        params = nn.deconv2d_init(key, in_ch, out_ch)
        params = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16), params)
        x = jax.random.normal(key, xshape, jnp.bfloat16)

        # the carry perturbation (c * tiny) defeats CSE/hoisting across
        # loop iterations without changing the measured op's cost
        t_dil = timed(lambda x, c: nn.deconv2d(
            params, x + c.astype(x.dtype) * 1e-30,
            impl="dilated").astype(jnp.float32).sum(), x)
        t_sub = timed(lambda x, c: nn.deconv2d(
            params, x + c.astype(x.dtype) * 1e-30,
            impl="subpixel").astype(jnp.float32).sum(), x)

        # phase conv alone (subpixel minus the interleave): one VALID 3x3
        # conv with 4*out_ch output channels over the padded input
        w = params["w"]
        wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
        idx = jnp.array([[3, 1, 5], [4, 2, 0]])
        kern = wp[idx[:, :, None, None], idx[None, None, :, :]]
        kern = jnp.transpose(kern, (1, 3, 5, 0, 2, 4)).reshape(
            3, 3, in_ch, 4 * out_ch)
        xp_shape = (xshape[0], xshape[1] + 2, xshape[2] + 2, in_ch)
        xp = jax.random.normal(key, xp_shape, jnp.bfloat16)
        t_phase = timed(lambda xp, c: jax.lax.conv_general_dilated(
            xp + c.astype(xp.dtype) * 1e-30, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32).sum(), xp)

        # depth-to-space alone on the phase-planar result
        m, n = xshape[1], xshape[2]
        y0 = jax.random.normal(key, (b, m, n, 4 * out_ch), jnp.bfloat16)

        def d2s(y, c):
            y = (y + c.astype(y.dtype) * 1e-30).reshape(
                b, m, n, 2, 2, out_ch)
            y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
                b, 2 * m, 2 * n, out_ch)
            return y.astype(jnp.float32).sum()

        t_d2s = timed(d2s, y0)

        flops = 2.0 * b * m * n * 25 * in_ch * out_ch
        floor_mac = flops / BF16_PEAK
        d2s_bytes = 2.0 * (b * m * n * 4 * out_ch * 2)  # bf16 read+write
        floor_d2s = d2s_bytes / HBM_PEAK
        kernel_floor = max(t_phase, floor_mac) + floor_d2s
        rec = {
            "stage": name, "x": list(xshape), "out_ch": out_ch,
            "t_dilated_ms": round(t_dil * 1e3, 3),
            "t_subpixel_ms": round(t_sub * 1e3, 3),
            "t_phase_conv_ms": round(t_phase * 1e3, 3),
            "t_d2s_ms": round(t_d2s * 1e3, 3),
            "floor_mac_ms": round(floor_mac * 1e3, 3),
            "floor_d2s_ms": round(floor_d2s * 1e3, 3),
            "kernel_route_floor_ms": round(kernel_floor * 1e3, 3),
            "available_pct": round(
                100.0 * (t_dil - kernel_floor) / t_dil, 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    tot_dil = sum(r["t_dilated_ms"] for r in results)
    tot_floor = sum(r["kernel_route_floor_ms"] for r in results)
    print(json.dumps({
        "verdict": "pallas_win_available"
        if tot_floor < 0.95 * tot_dil else "no_pallas_win",
        "total_dilated_ms": round(tot_dil, 3),
        "total_kernel_route_floor_ms": round(tot_floor, 3),
        "available_pct": round(100.0 * (tot_dil - tot_floor) / tot_dil, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
