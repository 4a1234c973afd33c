"""Quality parity of the int8 serving path on a TRAINED flagship model.

tests/test_quant.py pins numeric closeness on boosted random models; this
script closes the loop on REAL weights: load a trained VID_DCGAN checkpoint
(e.g. the endurance run's step 159,520), sample the same z batch through the
float and the int8 sampler (ops/quant.py), and report

  - pixel agreement (MAE in the uint8 domain + PSNR), and
  - the face track-rate metric (eval/track_rate.py — the project's headline
    quality number, reference consistency_experiment methodology) for BOTH
    variants on the SAME z batches (a paired comparison: any rate gap is
    attributable to quantization, not sampling noise).

A serving optimization that moves the quality metric is not an optimization;
this is the falsifiable check.

Usage:
    python examples/int8_quality_eval.py --checkpoint runs/endurance/checkpoints \
        [--clips 256] [--batch 64] [--cpu] [--dtype float32] [--json out.json]
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
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest in the dir)")
    ap.add_argument("--clips", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dtype", default="bfloat16",
                    help="float-path compute dtype (float32 on CPU)")
    ap.add_argument("--cascade", default=None)
    ap.add_argument("--calib-batches", type=int, default=0,
                    help="static activation calibration batches for the "
                         "int8 path (0 = dynamic per-layer max, the "
                         "default serving variant)")
    ap.add_argument("--float-last", action="store_true",
                    help="keep the tanh output layer in f32 "
                         "(mixed-precision int8; ops/quant.py float_last)")
    ap.add_argument("--float-layers", default="",
                    help="comma-separated layers to keep f32, e.g. "
                         "'vid/lin3,img/h0_lin' (mixed-precision ablation)")
    ap.add_argument("--calib-mode", default="max", choices=["max", "mse"],
                    help="static-scale calibration: plain max-abs or the "
                         "round-5 argmin-MSE fraction sweep")
    ap.add_argument("--bias-correct", action="store_true",
                    help="per-layer empirical bias correction against the "
                         "float folded reference (round-5 cliff work)")
    ap.add_argument("--finish-steps", type=int, default=0,
                    help="fake-quant/STE finishing steps before serving "
                         "(quant.finish_vid_stack; lr 1e-5, round-5 "
                         "cliff work's third rung)")
    ap.add_argument("--json", default=None, help="also write results here")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from gifgan_tpu.core import checkpoint as ckpt
    from gifgan_tpu.core.cache import enable_compile_cache
    from gifgan_tpu.core.config import (DCGANConfig, TrainConfig,
                                        VidGANConfig)
    from gifgan_tpu.eval.track_rate import EVAL_TRACK_CONFIG, face_track_rate
    from gifgan_tpu.track.detect import default_detector
    from gifgan_tpu.train import vid as vid_train

    enable_compile_cache()

    # model config: the run dir's params.json when present (train-vid runs
    # write one), else the flagship shape (endurance run / bench.py)
    params_json = os.path.join(args.checkpoint, os.pardir, "params.json")
    if os.path.exists(params_json):
        from dataclasses import replace

        from gifgan_tpu.core.config import load_config

        loaded = load_config(params_json)
        cfg = replace(loaded["model"], compute_dtype=args.dtype,
                      image_gan=replace(loaded["model"].image_gan,
                                        compute_dtype=args.dtype))
    else:
        img = DCGANConfig(output_size=64, c_dim=3, z_dim=100,
                          compute_dtype=args.dtype)
        cfg = VidGANConfig(z_input_size=120, z_output_size=100,
                           vid_length=16, image_gan=img,
                           first_frame_loss_scalar=1.0,
                           compute_dtype=args.dtype)
    ts = vid_train.init_train_state(jax.random.PRNGKey(0), cfg,
                                    TrainConfig(batch_size=args.batch))
    ts = vid_train.VidTrainState(**ckpt.restore(args.checkpoint,
                                                ts._asdict(),
                                                step=args.step))
    float_layers = tuple(s for s in args.float_layers.split(",") if s)
    q, sample_q = vid_train.quantize_sampler(
        ts, cfg, calib_batches=args.calib_batches,
        calib_batch_size=args.batch, float_last=args.float_last,
        float_layers=float_layers, calib_mode=args.calib_mode,
        bias_correct=args.bias_correct)
    if args.finish_steps:
        from gifgan_tpu.ops import quant

        q = quant.finish_vid_stack(q, ts.params, ts.state, cfg,
                                   steps=args.finish_steps,
                                   batch=args.batch)
        if args.bias_correct:   # re-match means on the finished weights
            import jax as _jax

            zs = [_jax.random.uniform(
                _jax.random.fold_in(_jax.random.PRNGKey(11), i),
                (args.batch, cfg.z_input_size), minval=-1.0, maxval=1.0)
                for i in range(8)]
            q = quant.bias_correct_vid_stack(q, ts.params, ts.state, zs,
                                             cfg)

    def to_u8(v):
        return np.asarray(jnp.clip((v + 1.0) * 127.5, 0, 255)).astype(
            np.uint8)

    from gifgan_tpu.track.detect import find_default_cascade

    detector = None
    try:
        detector = default_detector(
            cascade_path=args.cascade or find_default_cascade(),
            min_neighbors=2, min_size=20)
    except Exception as e:  # no cascade XML available
        print(f"track-rate skipped (no detector: {e})", flush=True)

    def track(clips_u8):
        if detector is None:
            return None
        ups = np.repeat(np.repeat(clips_u8, 2, 2), 2, 3)  # 2x upscale
        r = face_track_rate(list(ups), detector, EVAL_TRACK_CONFIG)
        return r["tracked"], r["total"]

    mae_sum = n_px = 0
    se_sum = 0.0
    tr_f = tr_q = tot = 0
    feats_f, feats_q = [], []
    from gifgan_tpu.eval.fad import (frechet_distance, gaussian_fit,
                                     h2_features)

    feat_fn = jax.jit(h2_features, static_argnames="cfg")
    for i in range(0, args.clips, args.batch):
        z = jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(7), i),
                               (args.batch, cfg.z_input_size),
                               minval=-1.0, maxval=1.0)
        take = min(args.batch, args.clips - i)
        vf = to_u8(vid_train.sample_videos(ts, z, cfg))[:take]
        vq = to_u8(sample_q(q, z, cfg))[:take]
        d = vf.astype(np.int32) - vq.astype(np.int32)
        mae_sum += np.abs(d).sum()
        se_sum += float((d.astype(np.float64) ** 2).sum())
        n_px += d.size
        for clips, acc in ((vf, "f"), (vq, "q")):
            t = track(clips)
            if t is not None:
                if acc == "f":
                    tr_f += t[0]
                else:
                    tr_q += t[0]
        # distributional parity under the checkpoint's OWN image-D
        # embedding (eval/fad.py): frames in [-1, 1]
        for clips, dst in ((vf, feats_f), (vq, feats_q)):
            fr = jnp.asarray(clips.reshape(-1, *clips.shape[2:]),
                             jnp.float32) / 127.5 - 1.0
            dst.append(np.asarray(feat_fn(
                ts.params.img_discriminator, ts.state.img_discriminator,
                fr, cfg.image_gan)))
        tot += take
        print(f"  {i + take}/{args.clips} clips", flush=True)

    mae = mae_sum / n_px
    mse = se_sum / n_px
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    mu_f, cov_f = gaussian_fit(np.concatenate(feats_f))
    mu_q, cov_q = gaussian_fit(np.concatenate(feats_q))
    fad_fq = round(float(frechet_distance(mu_f, cov_f, mu_q, cov_q)), 6)
    out = {
        "fad_float_vs_int8": fad_fq,
        "clips": tot,
        "pixel_mae_u8": round(float(mae), 3),
        "psnr_db": round(float(psnr), 2),
        "track_rate_float": round(tr_f / tot, 4) if detector else None,
        "track_rate_int8": round(tr_q / tot, 4) if detector else None,
        "checkpoint": args.checkpoint,
        "dtype_float_path": args.dtype,
        "int8_variant": (f"static-calib x{args.calib_batches}"
                         f"[{args.calib_mode}]"
                         if args.calib_batches else "dynamic")
                        + (" + bias-correct" if args.bias_correct else "")
                        + (f" + finish x{args.finish_steps}"
                           if args.finish_steps else "")
                        + (" + float-last" if args.float_last else "")
                        + (f" + float[{args.float_layers}]"
                           if float_layers else ""),
    }
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
