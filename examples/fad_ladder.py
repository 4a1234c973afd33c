"""FAD ladder on a trained VID_DCGAN checkpoint — the serving-quality anchor.

Reproducible version of the round-4 ad-hoc measurement (docs/ENDURANCE.md
"Post-hoc: FAD"): Fréchet Activation Distance (eval/fad.py — FID
construction in the TRAINED checkpoint's own frozen image-D h2 feature
space, the tap the whole latent/video stack builds on,
/root/reference/models/recurrent_z/model.py:268-279) between the synthetic
real-frame distribution and

  1. a second disjoint real sample      -> the finite-sample noise floor,
  2. the trained float generator        -> the headline quality number,
  3. the int8-quantized generator       -> serving-path distribution drift,
  4. an untrained (fresh-init) generator -> the scale of the metric.

All four rows share the SAME embedding (the trained D), so they are
comparable; the real rows share the corpus recipe of the endurance runs
(data/synthetic.py, seed 0).

Usage:
    python examples/fad_ladder.py --checkpoint runs/endurance3/checkpoints \
        [--frames 256] [--batch 64] [--cpu] [--json out.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--frames", type=int, default=256,
                    help="frames per distribution sample")
    ap.add_argument("--batch", type=int, default=16,
                    help="clips per generator dispatch")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gifgan_tpu.core import checkpoint as ckpt
    from gifgan_tpu.core.cache import enable_compile_cache
    from gifgan_tpu.core.config import DCGANConfig, TrainConfig, VidGANConfig
    from gifgan_tpu.data.synthetic import synthetic_clips
    from gifgan_tpu.eval.fad import frechet_distance, gaussian_fit, h2_features
    from gifgan_tpu.train import vid as vid_train

    enable_compile_cache()

    img = DCGANConfig(output_size=64, c_dim=3, z_dim=100,
                      compute_dtype=args.dtype)
    cfg = VidGANConfig(z_input_size=120, z_output_size=100, vid_length=16,
                       image_gan=img, first_frame_loss_scalar=1.0,
                       compute_dtype=args.dtype)
    tcfg = TrainConfig(batch_size=args.batch)
    ts0 = vid_train.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    ts = vid_train.VidTrainState(**ckpt.restore(args.checkpoint,
                                                ts0._asdict()))
    q, sample_q = vid_train.quantize_sampler(ts, cfg)

    N, T = args.frames, cfg.vid_length
    n_clips = (N + T - 1) // T
    s = cfg.image_gan.output_size

    # real frames: the endurance corpus recipe (seed 0); two DISJOINT
    # samples so row 1 is an honest floor
    corpus = synthetic_clips(2 * n_clips, length=T, size=s)
    frames = corpus.reshape(-1, s, s, 3).astype(np.float32) / 127.5 - 1.0
    real_a = frames[:N]
    real_b = frames[N:2 * N]

    def gen_frames(sample_fn):
        outs = []
        for i in range(0, n_clips, args.batch):
            b = min(args.batch, n_clips - i)
            z = jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(17), i),
                (args.batch, cfg.z_input_size), minval=-1.0, maxval=1.0)
            outs.append(np.asarray(sample_fn(z), np.float32)[:b])
        return np.concatenate(outs).reshape(-1, s, s, 3)[:N]

    fake_f = gen_frames(lambda z: vid_train.sample_videos(ts, z, cfg))
    fake_q = gen_frames(lambda z: sample_q(q, z, cfg))
    fake_0 = gen_frames(lambda z: vid_train.sample_videos(ts0, z, cfg))

    # one embedding for every row: the TRAINED checkpoint's frozen image-D
    feat_fn = jax.jit(h2_features, static_argnames="cfg")

    def fit(x):
        fs = []
        for i in range(0, len(x), 256):
            fs.append(np.asarray(feat_fn(
                ts.params.img_discriminator, ts.state.img_discriminator,
                jnp.asarray(x[i:i + 256]), cfg.image_gan)))
        return gaussian_fit(np.concatenate(fs))

    g_real = fit(real_a)
    rows = {}
    for name, x in (("real_vs_real_floor", real_b),
                    ("trained_float", fake_f),
                    ("trained_int8", fake_q),
                    ("untrained", fake_0)):
        mu, cov = fit(x)
        rows[name] = round(float(frechet_distance(*g_real, mu, cov)), 4)
        print(f"FAD real vs {name}: {rows[name]}", flush=True)

    out = {"frames_per_set": N, "checkpoint": args.checkpoint, **rows}
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
