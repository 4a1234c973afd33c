"""Endurance run: hours-scale flagship VID_DCGAN training with collapse
diagnostics, periodic checkpoints, track-rate trend evals, and kill/resume.

Round-1 verdict item 3: the longest documented runs were 150-6000 steps;
the reference trained epochs over ~202k images (time_script.py:18). This
script drives the chunked flagship path (train_chunk, K steps per dispatch)
for a wall-clock budget, logging the reference's collapse early-warning
signal (per-batch activation std, z_model_lib.py:220-249) plus the
face-track-rate quality proxy at a fixed cadence, checkpointing for exact
resume (params + opt slots + BN state), and surviving kill -9 mid-run.

Design for the 1-core host + ~35 MB/s relay:
  - the synthetic corpus is generated once, uploaded once (uint8), and each
    step's (B*T, s, s, 3) frame batch is gathered + scaled ON DEVICE inside
    the train_chunk scan body (vid.train_chunk_ids — 50 MB peak frame
    memory instead of a 4 GB whole-chunk stack) — the host never touches
    frame data in the loop, it ships (K, B) int32 ids per chunk
  - eval/checkpoint cadences are in chunks (1 chunk = K optimizer steps)

Usage:
  python examples/endurance_run.py --run-dir runs/endurance --hours 2
  # kill it at any point; then:
  python examples/endurance_run.py --run-dir runs/endurance --hours 2  # resumes
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--run-dir", default="runs/endurance")
    p.add_argument("--hours", type=float, default=2.0)
    p.add_argument("--max-chunks", type=int, default=0,
                   help="optional hard chunk limit (0 = wall-clock only)")
    p.add_argument("--corpus-clips", type=int, default=4096)
    p.add_argument("--chunk", type=int, default=80)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--image-noise", type=float, default=0.1)
    p.add_argument("--d-learning-rate", type=float, default=None,
                   help="TTUR: discriminator LR (default: shared 2e-4)")
    p.add_argument("--activation-noise", type=float, default=0.1)
    p.add_argument("--auto-intervene", action="store_true",
                   help="closed-loop collapse controller: watch per-chunk "
                        "d_loss and drive the traced runtime knobs (noise "
                        "stds, D-lr scale) when D saturates — the manual "
                        "intervention that saved run 1, automated "
                        "(train/controller.py); zero recompiles")
    p.add_argument("--img-gan-steps", type=int, default=2000)
    p.add_argument("--img-gan-batch", type=int, default=64)
    p.add_argument("--img-gan-dataset", type=int, default=4096)
    p.add_argument("--corpus-sampler", default="matmul",
                   choices=("pallas", "matmul", "take"),
                   help="device corpus gather: Pallas scalar-prefetch DMA "
                        "gather, MXU one-hot matmul (76x the row gather at "
                        "flagship shape), or jnp.take")
    p.add_argument("--corpus-layout", default="frames",
                   choices=("frames", "clips"),
                   help="DeviceCorpus resident layout. 'frames' (default "
                        "since round 5, matmul sampler only): the gather "
                        "output reaches the time-folded training batch via "
                        "a contiguous row-permutation transpose instead of "
                        "the retiling reshape+copy the per-op profile "
                        "measured at ~8.4 ms/step (42.4 -> 33.9 ms/step "
                        "device; values exact). 'clips' restores the "
                        "round-4 layout and per-step cost.")
    p.add_argument("--packed-c3", action="store_true",
                   help="phase-packed c=3 end layers (flagship bench "
                        "execution, +6% step): changes the program hash, so "
                        "the first run cold-compiles (~6 min) — committed "
                        "endurance baselines (runs 1-6, 23.3 steps/s) are "
                        "unpacked; re-baseline deliberately")
    p.add_argument("--dtype", default="bfloat16",
                   help="compute dtype (use float32 for CPU smoke tests — "
                        "bf16 is emulated and ~100x slower on CPU)")
    p.add_argument("--ckpt-every-chunks", type=int, default=150)
    p.add_argument("--eval-every-chunks", type=int, default=150)
    p.add_argument("--eval-clips", type=int, default=32)
    p.add_argument("--fad-frames", type=int, default=0,
                   help="also log the Fréchet activation distance between "
                        "N real corpus frames and N generated frames at "
                        "every eval (feature space = the FROZEN image-D, "
                        "stable across the run; 0 = off)")
    p.add_argument("--final-eval-clips", type=int, default=256)
    p.add_argument("--early-stop-patience", type=int, default=0,
                   help="stop the run after N consecutive periodic evals "
                        "without a track-rate/FAD improvement (0 = train "
                        "to the wall-clock budget). Evidence: run 3's "
                        "quality ERODED past its peak and run 4 finished "
                        "best at half the budget (docs/ENDURANCE.md)")
    p.add_argument("--early-stop-warmup", type=int, default=3,
                   help="never early-stop before this many evals total")
    p.add_argument("--fad-tie-delta", type=float, default=0.0,
                   help="FAD must drop by MORE than this to count as an "
                        "improvement when the track-rate is tied (the "
                        "run-4 regime saturates the proxy at 100%%)")
    p.add_argument("--no-keep-best", action="store_true",
                   help="disable snapshotting the best periodic eval's "
                        "checkpoint to <run-dir>/checkpoints_best")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu) for smoke tests; "
                        "exported as GIFGAN_PLATFORM to the phase-0 "
                        "subprocess")
    p.add_argument("--cascade", default=None,
                   help="frontalface cascade XML for the track-rate eval "
                        "(default: conventional locations via "
                        "find_default_cascade; evals are skipped with a "
                        "warning if none is found)")
    return p.parse_args()


def ensure_image_gan(run_dir: str, args) -> str:
    """Phase 0: train the nested image GAN via the tested CLI path."""
    img_dir = os.path.join(run_dir, "img")
    ckpt = os.path.join(img_dir, "checkpoints")
    if os.path.isdir(ckpt) and os.listdir(ckpt):
        return ckpt
    print(f"[endurance] phase 0: image GAN {args.img_gan_steps} steps",
          flush=True)
    subprocess.run([
        sys.executable, "-m", "gifgan_tpu", "train-dcgan",
        "--run-dir", img_dir, "--dataset", "synthetic",
        "--dataset-size", str(args.img_gan_dataset),
        "--batch-size", str(args.img_gan_batch),
        "--output-size", "64", "--c-dim", "3",
        "--steps-limit", str(args.img_gan_steps), "--sample-every", "0",
        "--compute-dtype", args.dtype,
        "--image-noise", str(args.image_noise),
    ], check=True)
    return ckpt


def main():
    args = parse_args()
    if args.platform:
        os.environ["GIFGAN_PLATFORM"] = args.platform
    os.makedirs(args.run_dir, exist_ok=True)
    img_ckpt = ensure_image_gan(args.run_dir, args)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from gifgan_tpu.core import checkpoint
    from gifgan_tpu.core.cache import enable_compile_cache
    from gifgan_tpu.core.config import (DCGANConfig, TrainConfig,
                                        VidGANConfig)
    from gifgan_tpu.data.device import DeviceCorpus
    from gifgan_tpu.data.synthetic import synthetic_clips
    from gifgan_tpu.eval.track_rate import EVAL_TRACK_CONFIG, face_track_rate
    from gifgan_tpu.track.detect import default_detector
    from gifgan_tpu.train import vid as vid_train

    enable_compile_cache()

    img = DCGANConfig(output_size=64, c_dim=3, z_dim=100,
                      compute_dtype=args.dtype, noise_std=args.image_noise,
                      packed_c3=args.packed_c3)
    cfg = VidGANConfig(z_input_size=120, z_output_size=100, vid_length=16,
                       image_gan=img, first_frame_loss_scalar=1.0,
                       compute_dtype=args.dtype,
                       image_noise_std=args.image_noise,
                       activation_noise_std=args.activation_noise)
    tcfg = TrainConfig(batch_size=args.batch, disc_updates=1, gen_updates=2,
                       d_learning_rate=args.d_learning_rate)
    K, B, T = args.chunk, args.batch, cfg.vid_length

    ckpt_dir = os.path.join(args.run_dir, "checkpoints")
    log_path = os.path.join(args.run_dir, "endurance.jsonl")

    ts = vid_train.init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    start_chunk = 0
    prior_wall = 0.0
    resumed = False
    if checkpoint.latest_step(ckpt_dir) is not None:
        step = checkpoint.latest_step(ckpt_dir)
        ts = checkpoint.restore(ckpt_dir, ts)
        start_chunk = step // K
        resumed = True
        # recover accumulated wall-clock from the log
        try:
            with open(log_path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except ValueError:
                        continue  # torn last line from a kill -9 mid-write
                    if rec.get("kind") == "chunk" and \
                            rec["chunk"] < start_chunk:
                        prior_wall = max(prior_wall, rec["wall_s"])
        except OSError:
            pass
        print(f"[endurance] RESUMED at step {step} (chunk {start_chunk}, "
              f"prior wall {prior_wall:.0f}s)", flush=True)
    else:
        ts = vid_train.load_image_gan(ts, img_ckpt)
        print("[endurance] fresh start: image GAN grafted, frozen",
              flush=True)

    # corpus: generated once on host, uploaded once as uint8, sampled on
    # device via the MXU one-hot matmul (data/device.py: 48 ms/chunk vs
    # 3.68 s for the jnp.take row gather at the flagship (80, 64) chunk)
    print(f"[endurance] generating {args.corpus_clips}-clip corpus",
          flush=True)
    corpus = synthetic_clips(args.corpus_clips, length=T, size=64)  # u8
    corpus_layout = (args.corpus_layout
                     if args.corpus_sampler == "matmul" else "clips")
    device_corpus = DeviceCorpus(corpus, method=args.corpus_sampler,
                                 layout=corpus_layout)
    del corpus


    from gifgan_tpu.track.detect import find_default_cascade

    cascade = args.cascade or find_default_cascade()
    detector = (default_detector(cascade_path=cascade, min_neighbors=2,
                                 min_size=20) if cascade else None)
    if detector is None:
        print("[endurance] WARNING: no cascade XML found — track-rate "
              "evals will be skipped", flush=True)

    def eval_track_rate(ts, n_clips, key):
        if detector is None:
            return {"rate": None, "tracked": 0, "total": 0}
        # fixed sampler batch (= --eval-clips) so the 256-clip final eval
        # reuses the SAME compiled program as the periodic evals — each new
        # shape costs minutes of remote compile through the relay
        tracked = total = 0
        for i in range(0, n_clips, args.eval_clips):
            kb = jax.random.fold_in(key, i)
            z = jax.random.uniform(kb, (args.eval_clips, cfg.z_input_size),
                                   minval=-1.0, maxval=1.0)
            vids = vid_train.sample_videos(ts, z, cfg)  # (n,T,s,s,3) [-1,1]
            vids = np.asarray(jnp.clip((vids + 1.0) * 127.5, 0, 255)
                              ).astype(np.uint8)
            take = min(args.eval_clips, n_clips - i)
            ups = np.repeat(np.repeat(vids[:take], 2, 2), 2, 3)  # 2x upscale
            r = face_track_rate(list(ups), detector, EVAL_TRACK_CONFIG)
            tracked += r["tracked"]
            total += r["total"]
        return {"rate": tracked / max(total, 1), "tracked": tracked,
                "total": total}

    def eval_fad(ts, key):
        """Distribution-level health: FAD between real corpus frames and
        generated frames under the frozen image-D embedding (eval/fad.py —
        frozen => values comparable across the whole run)."""
        if args.fad_frames <= 0:
            return None
        from gifgan_tpu.eval.fad import fad as fad_fn

        n = args.fad_frames
        kr, kf = jax.random.split(key)
        s_px = cfg.image_gan.output_size
        # real frames come back off the DEVICE corpus (the host copy is
        # freed right after upload); sample() already scales to [-1, 1]
        rid = jax.random.randint(kr, ((n + T - 1) // T,), 0,
                         device_corpus.n)
        real = np.asarray(device_corpus.sample(rid)
                          ).reshape(-1, s_px, s_px, 3)[:n]
        z = jax.random.uniform(kf, ((n + T - 1) // T, cfg.z_input_size),
                               minval=-1.0, maxval=1.0)
        fake = np.asarray(vid_train.sample_videos(ts, z, cfg)
                          ).reshape(-1, s_px, s_px, 3)[:n]
        return float(fad_fn(ts.params.img_discriminator,
                            ts.state.img_discriminator, real, fake,
                            cfg.image_gan, batch=min(n, 256)))

    # a kill -9 mid-write can leave the log's last line torn with no
    # trailing newline; appending straight onto it would merge (and lose)
    # the next record too — heal once at startup
    try:
        with open(log_path, "rb+") as f:
            f.seek(0, 2)
            if f.tell() > 0:
                f.seek(-1, 2)
                if f.read(1) != b"\n":
                    f.write(b"\n")
    except OSError:
        pass

    def log(rec):
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    # quality-plateau policy: tracks the best periodic eval (checkpoint
    # snapshot) and, when --early-stop-patience > 0, ends the run once the
    # track-rate/FAD evals stop improving (train/early_stop.py; the run-3/4
    # evidence says budget-bounded training past the peak erodes quality)
    from gifgan_tpu.train.early_stop import (EarlyStopConfig,
                                             QualityEarlyStop,
                                             replay_eval_log)

    stopping = args.early_stop_patience > 0
    quality = QualityEarlyStop(EarlyStopConfig(
        patience=args.early_stop_patience if stopping else 10**9,
        warmup_evals=args.early_stop_warmup,
        fad_tie_delta=args.fad_tie_delta))
    best_dir = os.path.join(args.run_dir, "checkpoints_best")
    if resumed:
        # policy state is a pure function of the log's eval prefix; only
        # replay records at or before the restored checkpoint's chunk
        replay_eval_log(log_path, quality, upto_chunk=start_chunk)
        if quality.stopped and stopping:
            print(f"[endurance] run already early-stopped at chunk "
                  f"{start_chunk} (best step {quality.best_step}, "
                  f"rate {quality.best_rate}, fad {quality.best_fad}) — "
                  f"nothing to resume", flush=True)
            return

    controller = None
    knobs = None
    if args.auto_intervene:
        from gifgan_tpu.train.controller import CollapseController

        controller = CollapseController(args.image_noise,
                                        args.activation_noise)
        if resumed:
            # knob values are policy state; recover the last levels the
            # run was actually training at (counters restart conservatively
            # — worst case the policy re-observes for `patience` chunks)
            try:
                with open(log_path) as f:
                    for line in f:
                        try:
                            rec = json.loads(line)
                        except ValueError:
                            continue  # torn last line (kill -9 mid-write)
                        # only replay events at or before the restored
                        # checkpoint's chunk (events at chunk c are logged
                        # before the ckpt at the same c) — later events
                        # belong to a lost tail about to be re-trained
                        if rec.get("kind") == "auto_intervention" and \
                                rec.get("chunk", start_chunk + 1) \
                                <= start_chunk:
                            controller.image_noise = rec["image_noise_std"]
                            controller.activation_noise = \
                                rec["activation_noise_std"]
                            controller.d_lr_scale = rec["d_lr_scale"]
            except OSError:
                pass
        knobs = vid_train.make_knobs(cfg, **controller.knob_values())

    # deterministic-per-chunk sampling so a resume continues the same
    # nominal data stream
    def chunk_idx(c):
        r = np.random.default_rng(10_000 + c)
        return jnp.asarray(r.integers(0, args.corpus_clips, (K, B)))

    t_start = time.time()
    deadline = t_start + args.hours * 3600 - prior_wall
    c = start_chunk
    log({"kind": "start", "chunk": c, "resumed": resumed,
         "prior_wall_s": prior_wall, "time": time.time(),
         "config": {"K": K, "B": B, "corpus": args.corpus_clips,
                    "image_noise": args.image_noise,
                    "activation_noise": args.activation_noise}})

    try:
        while time.time() < deadline:
            if args.max_chunks and c - start_chunk >= args.max_chunks:
                break
            t0 = time.perf_counter()
            z = jax.random.uniform(jax.random.PRNGKey(50_000 + c),
                                   (K, B, cfg.z_input_size),
                                   minval=-1.0, maxval=1.0)
            # frames gather + scale happens INSIDE the scan body, one
            # step's batch at a time (50 MB peak instead of the 4 GB
            # whole-chunk stack — see train_chunk_ids)
            ts, m = vid_train.train_chunk_ids(
                ts, chunk_idx(c), z, jax.random.PRNGKey(c),
                device_corpus.data, cfg, tcfg,
                # fold_sample_fn: time folds into batch inside the gather
                # (value-exact; with layout="frames" this is the round-5
                # formatting fix — see --corpus-layout)
                sample_fn=device_corpus.fold_sample_fn, knobs=knobs)
            d_loss = float(np.asarray(m["d_loss"][-1]))  # sync point
            dt = time.perf_counter() - t0
            c += 1
            rec = {"kind": "chunk", "chunk": c, "step": c * K,
                   "wall_s": prior_wall + (time.time() - t_start),
                   "dt_s": round(dt, 3),
                   "steps_per_s": round(K / dt, 2),
                   "d_loss": d_loss}
            for k in ("g_loss", "first_frame_loss", "fake_activation_std",
                      "real_activation_std", "images_std", "d_loss_fake",
                      "d_loss_real"):
                if k in m:
                    rec[k] = float(np.asarray(m[k][-1]))
            if controller is not None:
                rec.update(controller.knob_values())
                event = controller.observe(d_loss)
                if event is not None:
                    # same compiled program — only the traced scalars move
                    knobs = vid_train.make_knobs(cfg,
                                                 **controller.knob_values())
                    event.update({"kind": "auto_intervention", "chunk": c,
                                  "step": c * K})
                    log(event)
                    print(f"[endurance] AUTO-INTERVENTION @chunk {c}: "
                          f"{event['action']} -> noise="
                          f"{controller.image_noise} "
                          f"d_lr_scale={controller.d_lr_scale}", flush=True)
            log(rec)
            if c % 10 == 0:
                print(f"[endurance] chunk {c} step {c * K} "
                      f"{rec['steps_per_s']:.1f} steps/s d={d_loss:.3f} "
                      f"g={rec.get('g_loss', 0):.3f} "
                      f"fstd={rec.get('fake_activation_std', 0):.3f} "
                      f"rstd={rec.get('real_activation_std', 0):.3f}",
                      flush=True)
            if c % args.ckpt_every_chunks == 0:
                checkpoint.save(ckpt_dir, c * K, ts, max_to_keep=3)
                log({"kind": "ckpt", "chunk": c, "step": c * K,
                     "wall_s": prior_wall + (time.time() - t_start)})
            if c % args.eval_every_chunks == 0:
                ev = eval_track_rate(ts, args.eval_clips,
                                     jax.random.PRNGKey(777))
                ev.update({"kind": "eval", "chunk": c, "step": c * K,
                           "wall_s": prior_wall + (time.time() - t_start),
                           "fad": eval_fad(ts, jax.random.PRNGKey(778 + c))})
                log(ev)
                print(f"[endurance] eval @step {c * K}: track-rate "
                      f"{ev['tracked']}/{ev['total']} fad={ev['fad']}",
                      flush=True)
                qev = quality.observe(ev["rate"], ev["fad"],
                                      chunk=c, step=c * K)
                if qev is not None:
                    qev["wall_s"] = prior_wall + (time.time() - t_start)
                    log(qev)
                    if qev["kind"] == "quality_best":
                        if not args.no_keep_best:
                            checkpoint.save(best_dir, c * K, ts,
                                            max_to_keep=1)
                        print(f"[endurance] NEW BEST @step {c * K}: "
                              f"rate={ev['rate']} fad={ev['fad']}",
                              flush=True)
                    elif qev["kind"] == "early_stop" and stopping:
                        print(f"[endurance] EARLY STOP @step {c * K}: "
                              f"{qev['since_best']} evals without "
                              f"improvement (best: step "
                              f"{qev['best_step']}, rate "
                              f"{qev['best_rate']}, fad "
                              f"{qev['best_fad']})", flush=True)
                        break
    finally:
        checkpoint.save(ckpt_dir, c * K, ts, max_to_keep=3)
        log({"kind": "final_ckpt", "chunk": c, "step": c * K,
             "wall_s": prior_wall + (time.time() - t_start)})

    ev = eval_track_rate(ts, args.final_eval_clips, jax.random.PRNGKey(999))
    ev.update({"kind": "final_eval", "chunk": c, "step": c * K,
               "wall_s": prior_wall + (time.time() - t_start),
               "fad": eval_fad(ts, jax.random.PRNGKey(998))})
    log(ev)
    print(f"[endurance] DONE: {c * K} steps, final track-rate "
          f"{ev['tracked']}/{ev['total']}", flush=True)

    # the serving artifact is the BEST periodic eval's checkpoint, not the
    # last one — when they differ, score the best snapshot at final-eval
    # scale too (same protocol/keys), so the log states which to ship
    if (not args.no_keep_best and quality.best_step is not None
            and quality.best_step != c * K
            and checkpoint.latest_step(best_dir) is not None):
        ts_best = checkpoint.restore(best_dir, ts)
        evb = eval_track_rate(ts_best, args.final_eval_clips,
                              jax.random.PRNGKey(999))
        evb.update({"kind": "final_eval_best", "chunk": quality.best_chunk,
                    "step": quality.best_step,
                    "wall_s": prior_wall + (time.time() - t_start),
                    "fad": eval_fad(ts_best, jax.random.PRNGKey(998))})
        log(evb)
        print(f"[endurance] BEST (step {quality.best_step}): track-rate "
              f"{evb['tracked']}/{evb['total']} fad={evb['fad']} — "
              f"serve this one if it beats the final", flush=True)


if __name__ == "__main__":
    main()
