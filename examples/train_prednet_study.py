"""Extended PredNet study: train the first-party scan-based PredNet
(models/prednet.py) on the synthetic face-blob corpus and track held-out
next-frame MAE vs the copy-last-frame baseline.

Round-2 measured 0.00709 vs the 0.00891 copy baseline at 1500 steps,
still improving — this runs the same config (channels (32, 64), L1 error
loss, Adam 1e-3, batch 16, 16-frame 64px clips) longer and records the
curve. Reference context: the reference vendored PredNet as an unintegrated
comparison baseline (models/recurrent_image/prednet_reference/); this is
the integrated, trainable rebuild.

Usage: python examples/train_prednet_study.py [--steps 6000] [--eval-every 500]
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
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--train-clips", type=int, default=512)
    ap.add_argument("--eval-clips", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--length", type=int, default=16)
    ap.add_argument("--channels", type=int, nargs="*", default=[32, 64])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (tests/toy runs)")
    ap.add_argument("--out", default="/tmp/prednet_study.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        # env JAX_PLATFORMS is overridden by this image's sitecustomize;
        # the config update after import is the reliable switch
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from gifgan_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from gifgan_tpu.data.synthetic import synthetic_clips
    from gifgan_tpu.models import prednet

    cfg = prednet.PredNetConfig(image_size=args.size, c_dim=3,
                                channels=tuple(args.channels))
    train = synthetic_clips(args.train_clips, length=args.length,
                            size=args.size).astype(np.float32) / 255.0
    heldout = jnp.asarray(synthetic_clips(
        args.eval_clips, length=args.length, size=args.size,
        seed=999).astype(np.float32) / 255.0)

    copy_mae = float(jnp.mean(jnp.abs(
        heldout[:, 1:] - heldout[:, :-1])))
    print(f"copy-last held-out MAE: {copy_mae:.5f}", flush=True)

    params = prednet.init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(prednet.loss_fn)(params, batch, cfg)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_mae(params):
        preds, _ = prednet.forward(params, heldout, cfg)
        return jnp.mean(jnp.abs(preds[:, 1:] - heldout[:, 1:]))

    rng = np.random.default_rng(0)
    trace = []
    t0 = time.time()
    for i in range(1, args.steps + 1):
        idx = rng.integers(0, len(train), args.batch)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(train[idx]))
        if i % args.eval_every == 0 or i == args.steps:
            mae = float(np.asarray(eval_mae(params)))
            trace.append({"step": i, "heldout_mae": round(mae, 6),
                          "train_loss": round(float(np.asarray(loss)), 6),
                          "vs_copy": round(copy_mae / mae, 3)})
            print(f"step {i}: held-out MAE {mae:.5f} "
                  f"({copy_mae / mae:.2f}x vs copy-last) "
                  f"[{time.time() - t0:.0f}s]", flush=True)
    with open(args.out, "w") as f:
        json.dump({"copy_mae": copy_mae, "trace": trace}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
