"""Tuned-run evidence for the recurrent_image adversarial curriculum knobs.

Round-2 measured the curriculum's endpoints (docs/E2E_RESULTS.md): a
pixel-only warm-up reaches 0.97x copy-last held-out MAE, and switching the
adversarial term on at the reference's hard-coded weight 1.0
(recurrent_DCGAN.py:294-298) trades that to 0.0255 (2.8x worse). What was
never measured is the trade-off CURVE — what the adversarial phase buys
(sharpness/motion, the things pixel-L1 famously blurs away) at what MAE
cost, as a function of the new `adversarial_loss_scalar` lever.

Protocol (controlled fork): train ONE pixel-only warm-up
(pixel_loss_scalar 200, adv gated off until `--warmup` steps; D trains
throughout so it is ready), snapshot the state, then continue each arm
from that same snapshot for `--adv-steps` steps with a different
adversarial weight. Metrics on 64 held-out clips:

- heldout_mae: mean |pred - next frame|   (fidelity; copy-last baseline printed)
- sharp_ratio: spatial-gradient energy of predictions / of real next
  frames (1.0 = as sharp as real; pixel-only regression sits below 1)
- motion_ratio: mean |pred - input frame| / mean |next - input frame|
  (0 = the degenerate copy-last solution, 1 = moves as much as real data)

Usage: python examples/recurrent_adv_study.py [--warmup 2000] [--adv-steps 800]
       [--scales 0.0 0.03 0.1 1.0] [--cpu] [--out docs/recurrent_adv_study.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warmup", type=int, default=2000)
    ap.add_argument("--adv-steps", type=int, default=800)
    ap.add_argument("--eval-every", type=int, default=200)
    ap.add_argument("--scales", type=float, nargs="*",
                    default=[0.0, 0.03, 0.1, 1.0])
    ap.add_argument("--train-clips", type=int, default=512)
    ap.add_argument("--eval-clips", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--length", type=int, default=16)
    ap.add_argument("--pixel-loss-scalar", type=float, default=200.0)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (tests/toy runs)")
    ap.add_argument("--out", default="/tmp/recurrent_adv_study.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        # env JAX_PLATFORMS is overridden by this image's sitecustomize;
        # the config update after import is the reliable switch
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gifgan_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from gifgan_tpu.core.config import RecurrentImageConfig, TrainConfig
    from gifgan_tpu.data.synthetic import synthetic_clips
    from gifgan_tpu.train import recurrent as rt

    def make_cfg(adv_scale):
        return RecurrentImageConfig(
            image_size=args.size, seq_length=args.length,
            pixel_loss_scalar=args.pixel_loss_scalar,
            adversarial_after_steps=args.warmup,
            adversarial_loss_scalar=adv_scale,
            compute_dtype=args.dtype)

    tcfg = TrainConfig(batch_size=args.batch)
    train = synthetic_clips(args.train_clips, length=args.length + 1,
                            size=args.size).astype(np.float32) / 255.0
    heldout = jnp.asarray(synthetic_clips(
        args.eval_clips, length=args.length + 1, size=args.size,
        seed=999).astype(np.float32) / 255.0)
    x_real, y_real = heldout[:, :-1], heldout[:, 1:]

    def grad_energy(f):
        return (jnp.mean(jnp.abs(f[:, :, 1:] - f[:, :, :-1]))
                + jnp.mean(jnp.abs(f[:, :, :, 1:] - f[:, :, :, :-1])))

    copy_mae = float(jnp.mean(jnp.abs(y_real - x_real)))
    real_grad = float(grad_energy(y_real))
    print(f"copy-last held-out MAE {copy_mae:.5f}, "
          f"real grad-energy {real_grad:.5f}", flush=True)

    def evaluate(ts, cfg):
        preds = rt.predict(ts, heldout, cfg).astype(jnp.float32)
        mae = float(jnp.mean(jnp.abs(preds - y_real)))
        sharp = float(grad_energy(preds)) / real_grad
        motion = (float(jnp.mean(jnp.abs(preds - x_real)))
                  / max(copy_mae, 1e-9))
        return {"heldout_mae": round(mae, 6), "vs_copy": round(copy_mae / mae, 3),
                "sharp_ratio": round(sharp, 4), "motion_ratio": round(motion, 4)}

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def run(ts, cfg, n_steps, label):
        nonlocal key
        t0 = time.time()
        trace = []
        for i in range(1, n_steps + 1):
            idx = rng.integers(0, len(train), args.batch)
            key, sub = jax.random.split(key)
            ts, metrics = rt.train_step(ts, jnp.asarray(train[idx]), sub,
                                        cfg, tcfg)
            if i % args.eval_every == 0 or i == n_steps:
                m = evaluate(ts, cfg)
                m["step"] = int(np.asarray(ts.step))
                m["d_loss"] = round(float(np.asarray(metrics["d_loss"])), 4)
                trace.append(m)
                print(f"[{label}] step {m['step']}: MAE {m['heldout_mae']:.5f} "
                      f"({m['vs_copy']:.2f}x copy) sharp {m['sharp_ratio']:.3f} "
                      f"motion {m['motion_ratio']:.3f} d={m['d_loss']:.3f} "
                      f"[{time.time() - t0:.0f}s]", flush=True)
        return ts, trace

    # ---- shared pixel-only warm-up (adv gated off below args.warmup) ----
    cfg0 = make_cfg(args.scales[0])
    ts = rt.init_train_state(jax.random.PRNGKey(1), cfg0, tcfg)
    ts, warm_trace = run(ts, cfg0, args.warmup, "warmup")
    # train_step donates its state input, so snapshot to host before forking
    snap = jax.device_get(ts)
    rng_state = rng.bit_generator.state
    key_snap = np.asarray(key)

    results = {"copy_mae": round(copy_mae, 6),
               "config": {"warmup": args.warmup, "adv_steps": args.adv_steps,
                          "pixel_loss_scalar": args.pixel_loss_scalar,
                          "batch": args.batch, "size": args.size,
                          "length": args.length, "dtype": args.dtype},
               "warmup_trace": warm_trace, "arms": {}}
    for s in args.scales:
        # identical data/noise stream per arm: restore host RNG state too
        rng.bit_generator.state = rng_state
        key = jnp.asarray(key_snap)
        cfg = make_cfg(s)
        ts_arm = jax.device_put(snap)
        _, trace = run(ts_arm, cfg, args.adv_steps, f"adv={s}")
        results["arms"][str(s)] = trace

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
