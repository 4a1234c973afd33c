"""Close the empirical expression-path loop (round-1 verdict item 2).

The reference's webcam demo animated faces along demo/manual_paths/*.txt —
latent paths hand-curated from real-data z_space_finder outputs
(run_webcam_demo:46-48). This script performs that whole loop against a
trained checkpoint, end to end:

  1. load the trained image GAN (e.g. the endurance run's phase-0 model)
  2. invert HELD-OUT synthetic clips (seed disjoint from the training
     corpus) to per-clip z-trajectories (invert/z_finder, the
     z_space_finder rebuild)
  3. curate data-derived paths from those trajectories (demo/derive:
     coherent-motion ranking + smoothing + re-zero, plus PCA directions)
  4. serve the webcam service with the derived paths, POST a held-out
     face over real HTTP, and verify the returned path animations exist
     and actually move (inter-frame motion above threshold)

Artifacts: trajectories + derived .txt paths + provenance.json +
animation previews, under --out-dir (committed under docs/derived_paths).

Usage (TPU, after examples/endurance_run.py):
  python examples/empirical_paths.py --img-checkpoint \
      runs/endurance/img/checkpoints --out-dir docs/derived_paths
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--img-checkpoint",
                   default="runs/endurance/img/checkpoints")
    p.add_argument("--out-dir", default="docs/derived_paths")
    p.add_argument("--traj-dir", default="runs/endurance/ztraj")
    p.add_argument("--heldout-seed", type=int, default=1,
                   help="synthetic corpus seed, disjoint from training's 0")
    p.add_argument("--clips", type=int, default=16)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--initial-steps", type=int, default=500)
    p.add_argument("--steps-per-frame", type=int, default=100)
    p.add_argument("--top-k", type=int, default=4)
    p.add_argument("--magnitude", type=float, default=0.0)
    p.add_argument("--port", type=int, default=8093)
    p.add_argument("--platform", default=None)
    p.add_argument("--invert-steps", type=int, default=1200,
                   help="webcam-service inversion budget per request")
    p.add_argument("--min-motion", type=float, default=0.5,
                   help="mean abs inter-frame uint8 diff a path animation "
                        "must exceed to count as moving")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from gifgan_tpu.core.cache import enable_compile_cache
    from gifgan_tpu.core.config import InvertConfig
    from gifgan_tpu.cli import _load_dcgan_from_run
    from gifgan_tpu.data.synthetic import synthetic_clips
    from gifgan_tpu.demo import (derive_paths, load_trajectories,
                                 pca_directions, score_trajectory,
                                 write_paths)
    from gifgan_tpu.invert.z_finder import extract_z_trajectories
    from gifgan_tpu.serve.webcam import (WebcamBackend, animate_via_service,
                                         serve)

    enable_compile_cache()
    cfg, params, state = _load_dcgan_from_run(args.img_checkpoint)
    print(f"[paths] image GAN loaded from {args.img_checkpoint} "
          f"({cfg.output_size}px, z{cfg.z_dim})", flush=True)

    # ---- 2. held-out clips -> z-trajectories ------------------------------
    clips = synthetic_clips(args.clips, length=16, size=cfg.output_size,
                            seed=args.heldout_seed)
    clip_store = {f"heldout_{i:03d}": clips[i].astype(np.float32) / 127.5 - 1
                  for i in range(args.clips)}
    icfg = InvertConfig(steps=args.initial_steps, learning_rate=0.05,
                        lr_decay_every=1000, pixel_l1=1.0,
                        activation_l1=0.3, batch_size=args.batch)
    t0 = time.time()
    written = extract_z_trajectories(
        params, state, cfg, icfg, sorted(clip_store),
        lambda p: clip_store[p], args.traj_dir, batch_size=args.batch,
        num_initial_steps=args.initial_steps,
        num_steps_per_frame=args.steps_per_frame)
    print(f"[paths] z-extract: {len(written)} new trajectories "
          f"({time.time() - t0:.0f}s) -> {args.traj_dir}", flush=True)

    # ---- 3. curate --------------------------------------------------------
    trajs = load_trajectories(args.traj_dir)
    paths = derive_paths(trajs, top_k=args.top_k,
                         smooth_window=3, magnitude=args.magnitude)
    dirs = pca_directions(trajs, n_directions=8)
    write_paths(args.out_dir, paths)
    prov = {
        "source": "invert/z_finder.extract_z_trajectories over held-out "
                  f"synthetic clips (seed={args.heldout_seed}, "
                  f"n={args.clips})",
        "img_checkpoint": args.img_checkpoint,
        "scores": {n: round(score_trajectory(t), 4)
                   for n, t in sorted(trajs.items())},
        "selected": sorted(paths),
        "pca_explained_axes": int(dirs.shape[0]),
        "config": {"initial_steps": args.initial_steps,
                   "steps_per_frame": args.steps_per_frame,
                   "top_k": args.top_k, "magnitude": args.magnitude},
    }
    with open(os.path.join(args.out_dir, "provenance.json"), "w") as f:
        json.dump(prov, f, indent=1)
    print(f"[paths] derived {sorted(paths)} -> {args.out_dir}", flush=True)

    # ---- 4. serve + animate over real HTTP --------------------------------
    backend = WebcamBackend(params, state, cfg,
                            os.path.join(args.out_dir, "service_out"),
                            paths=paths, steps=args.invert_steps,
                            batch_size=max(4, min(16, args.batch)))
    th = threading.Thread(target=serve, args=(backend,),
                          kwargs={"port": args.port}, daemon=True)
    th.start()
    time.sleep(1.0)
    face = clips[0, 0]                        # held-out clip, first frame
    result = animate_via_service(f"http://127.0.0.1:{args.port}", face)
    assert result.get("paths"), "service returned no path animations"

    import imageio.v2 as imageio

    from gifgan_tpu.data.video import decode_clip

    n_frames = next(iter(paths.values())).shape[0]
    report = {}
    for name, mp4 in sorted(result["paths"].items()):
        # imageio has no mp4-read backend in this image; cv2 decode does
        frames = decode_clip(mp4, n_frames, cfg.output_size, strict=False)
        motion = float(np.abs(np.diff(frames.astype(np.float32), axis=0))
                       .mean())
        report[name] = {"frames": int(frames.shape[0]),
                        "mean_interframe_motion": round(motion, 3),
                        "file": mp4}
        # keep a committed GIF preview of the best artifact
        gif = os.path.join(args.out_dir, f"preview_{name}.gif")
        imageio.mimwrite(gif, list(frames), format="GIF", fps=8, loop=0)
    moving = {n: r for n, r in report.items()
              if r["mean_interframe_motion"] > args.min_motion}
    prov["animation_report"] = report
    prov["final_inversion_loss"] = result.get("final_loss")
    with open(os.path.join(args.out_dir, "provenance.json"), "w") as f:
        json.dump(prov, f, indent=1)
    print(f"[paths] served animations: {len(report)} paths, "
          f"{len(moving)} with real motion; inversion loss "
          f"{result.get('final_loss'):.4f}", flush=True)
    assert moving, "no derived path produced visible motion"
    print("[paths] DONE", flush=True)


if __name__ == "__main__":
    main()
