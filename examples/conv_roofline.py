"""Conv-side roofline: the image-D 5x5 stride-2 stack and the 3-channel
end layers (round-3 verdict item 4 — PROFILE.md closed the deconv question
with a measured roofline but ASSERTED "shape-intrinsic" for the conv side).

Reference shapes: models/recurrent_z/model.py:268-279 (D conv stack),
ops.py:51-62 (conv2d 5x5/2 SAME); the flagship image batch is 1024 frames
(64 clips x 16), D sees real and fake passes.

Two questions, each answered by measurement on the real chip:

1. The D stack (3->64->128->256->512). The per-op audit says the well-
   shaped convs already run at 53-86% of bf16 peak. Here every stage gets
   the deconv-roofline treatment: production time (fwd and fwd+bwd) vs the
   best alternative formulation's measured time + physical floors.
2. The c=3 ends (D input conv, G output deconv: 2.86 ms/step at 7% peak,
   blamed on "intrinsic lane padding: N=3 against 128 lanes"). But a
   space-to-depth phase packing changes that number: packing 2x2 input
   phases turns the stride-2 k=5 SAME conv into a dense VALID 3x3 conv
   over 4*c_in channels (3 -> 12 lanes, 4x utilization; 25 useful taps in
   36 slots), and the G-side subpixel deconv computes 4*c_out = 12 output
   channels before its depth-to-space. "N=3 is intrinsic" is only true if
   these reformulations don't pay for themselves — measure, don't assert.

Emits one JSON line per (stage, direction) + a verdict line; paste into
PROFILE.md. Usage: python examples/conv_roofline.py [--iters 30]
[--batch 1024] [--check] (--check verifies the s2d formulation vs the
production conv in float32 before timing).
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


def s2d_pack(x):
    """(b, 2m, 2n, c) -> (b, m, n, 4c), channel order (row-phase, col-phase,
    c) — the input-side mirror of _deconv2d_subpixel's depth-to-space."""
    import jax.numpy as jnp

    b, H, W, c = x.shape
    m, n = H // 2, W // 2
    xs = x.reshape(b, m, 2, n, 2, c)
    return jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(b, m, n, 4 * c)


def s2d_kernel(w):
    """(5, 5, cin, cout) conv kernel -> (3, 3, 4*cin, cout) kernel over the
    phase-packed input.

    1-D derivation: SAME stride-2 k=5 pads (1, 2), so
      y[j] = sum_t x[2j-1+t] w[t]
           = x_odd[j-1] w0 + x_even[j] w1 + x_odd[j] w2
             + x_even[j+1] w3 + x_odd[j+1] w4
    i.e. per displacement d in {-1,0,1} and input phase p, the tap is
    E[d+1, p] with E = [[none,0],[1,2],[3,4]] (none = zero slot). 25 of the
    36 2-D slots are real taps; the zeros buy 3->12 lane packing on c=3.
    """
    import jax.numpy as jnp

    cin, cout = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # index 5 = zeros
    E = jnp.array([[5, 0], [1, 2], [3, 4]])  # (d+1, phase) -> tap index
    kern = wp[E[:, :, None, None], E[None, None, :, :]]  # (3,2,3,2,ci,co)
    kern = jnp.transpose(kern, (0, 2, 1, 3, 4, 5))       # (dr,dc,pr,pc,..)
    return kern.reshape(3, 3, 4 * cin, cout)


def s2d_conv(w, x):
    """Production-equivalent stride-2 k=5 SAME conv via phase packing."""
    import jax
    import jax.numpy as jnp

    xs = s2d_pack(x)
    xs = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jax.lax.conv_general_dilated(
        xs, s2d_kernel(w), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from gifgan_tpu.core.cache import enable_compile_cache
    from gifgan_tpu.ops import nn

    enable_compile_cache()
    key = jax.random.PRNGKey(0)

    if args.check:
        wc = jax.random.normal(key, (5, 5, 3, 8), jnp.float32)
        xc = jax.random.normal(key, (2, 16, 16, 3), jnp.float32)
        ref = nn.conv2d({"w": wc, "b": jnp.zeros((8,))}, xc)
        alt = s2d_conv(wc, xc)
        err = float(jnp.max(jnp.abs(ref - alt)))
        print(json.dumps({"s2d_check_max_abs_err": err}))
        assert err < 1e-4, err

    K = args.iters
    b = args.batch

    def timed(fn, *xs):
        """Median of 3: K applications inside one jitted fori_loop; carry
        perturbation defeats CSE; sync by fetching the scalar (the relay
        under-reports block_until_ready)."""

        @jax.jit
        def loop(*xs):
            def body(_, c):
                return c + fn(*xs, c)
            return jax.lax.fori_loop(0, K, body, jnp.zeros((), jnp.float32))

        float(np.asarray(loop(*xs)))
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(*xs)))
            best.append((time.perf_counter() - t0) / K)
        return float(np.median(best))

    # --- D stack: production SAME conv vs phase-packed dense conv -------
    stages = [("D:64->32 c3", (b, 64, 64, 3), 64),
              ("D:32->16", (b, 32, 32, 64), 128),
              ("D:16->8", (b, 16, 16, 128), 256),
              ("D:8->4", (b, 8, 8, 256), 512)]
    results = []
    for name, xshape, cout in stages:
        cin = xshape[-1]
        w = jax.random.normal(key, (5, 5, cin, cout), jnp.bfloat16) * 0.02
        x = jax.random.normal(key, xshape, jnp.bfloat16)

        def prod_fwd(x, w, c):
            return jax.lax.conv_general_dilated(
                x + c.astype(x.dtype) * 1e-30, w, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(jnp.float32).sum()

        def alt_fwd(x, w, c):
            return s2d_conv(w, x + c.astype(x.dtype) * 1e-30).astype(
                jnp.float32).sum()

        def bwd_of(f):
            def g(x, w, c):
                l, grads = jax.value_and_grad(
                    lambda x, w: f(x, w, c), argnums=(0, 1))(x, w)
                return (l + sum(gr.astype(jnp.float32).sum()
                                for gr in grads))
            return g

        t_pf = timed(prod_fwd, x, w)
        t_af = timed(alt_fwd, x, w)
        t_pb = timed(bwd_of(prod_fwd), x, w)
        t_ab = timed(bwd_of(alt_fwd), x, w)

        m = xshape[1] // 2
        flops = 2.0 * b * m * m * 25 * cin * cout
        floor_mac = flops / BF16_PEAK
        s2d_bytes = 2.0 * (b * xshape[1] * xshape[2] * cin * 2)
        rec = {
            "stage": name, "x": list(xshape), "cout": cout,
            "t_prod_fwd_ms": round(t_pf * 1e3, 3),
            "t_s2d_fwd_ms": round(t_af * 1e3, 3),
            "t_prod_fwdbwd_ms": round(t_pb * 1e3, 3),
            "t_s2d_fwdbwd_ms": round(t_ab * 1e3, 3),
            "floor_mac_fwd_ms": round(floor_mac * 1e3, 3),
            "floor_s2d_bytes_ms": round(s2d_bytes / HBM_PEAK * 1e3, 3),
            "fwdbwd_speedup_pct": round(100.0 * (t_pb - t_ab) / t_pb, 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # --- G output deconv (c=3): dilated vs per-stage subpixel -----------
    dw = jax.random.normal(key, (5, 5, 3, 64), jnp.bfloat16) * 0.02
    gx = jax.random.normal(key, (b, 32, 32, 64), jnp.bfloat16)
    dparams = {"w": dw, "b": jnp.zeros((3,), jnp.bfloat16)}

    def g_fwd(impl):
        def f(x, w, c):
            return nn.deconv2d({"w": w, "b": dparams["b"]},
                               x + c.astype(x.dtype) * 1e-30,
                               impl=impl).astype(jnp.float32).sum()
        return f

    def g_bwd(impl):
        def f(x, w, c):
            l, grads = jax.value_and_grad(
                lambda x, w: nn.deconv2d(
                    {"w": w, "b": dparams["b"]},
                    x + c.astype(x.dtype) * 1e-30,
                    impl=impl).astype(jnp.float32).sum(),
                argnums=(0, 1))(x, w)
            return l + sum(gr.astype(jnp.float32).sum() for gr in grads)
        return f

    rec = {
        "stage": "G:32->64 c3 deconv", "x": [b, 32, 32, 64], "cout": 3,
        "t_dilated_fwd_ms": round(timed(g_fwd("dilated"), gx, dw) * 1e3, 3),
        "t_subpixel_fwd_ms": round(
            timed(g_fwd("subpixel"), gx, dw) * 1e3, 3),
        "t_dilated_fwdbwd_ms": round(
            timed(g_bwd("dilated"), gx, dw) * 1e3, 3),
        "t_subpixel_fwdbwd_ms": round(
            timed(g_bwd("subpixel"), gx, dw) * 1e3, 3),
    }
    rec["fwdbwd_speedup_pct"] = round(
        100.0 * (rec["t_dilated_fwdbwd_ms"] - rec["t_subpixel_fwdbwd_ms"])
        / rec["t_dilated_fwdbwd_ms"], 1)
    results.append(rec)
    print(json.dumps(rec), flush=True)

    # --- verdict: projected step win if every winning stage switched ----
    # Step-level multiplicity at the flagship config (1 D + 2 G updates;
    # D fwd+bwd runs on real AND fake in the D update, fwd-only inside the
    # G updates' loss): the audit's per-step cost already reflects this,
    # so report the per-op deltas and let PROFILE.md do the step math.
    saved = sum(
        max(0.0, r.get("t_prod_fwdbwd_ms", r.get("t_dilated_fwdbwd_ms", 0))
            - r.get("t_s2d_fwdbwd_ms", r.get("t_subpixel_fwdbwd_ms", 1e9)))
        for r in results)
    print(json.dumps({
        "verdict": "reformulation_win_available" if saved > 0.3
        else "no_reformulation_win",
        "fwdbwd_ms_saved_if_all_winners_switch": round(saved, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
