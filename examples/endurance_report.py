"""Summarize an endurance-run JSONL trace into the docs/ENDURANCE.md tables.

Reads runs/<name>/endurance.jsonl (written by examples/endurance_run.py) and
prints markdown: throughput stability, loss/diagnostic trend at fixed
checkpoints, track-rate evals, and the restart/checkpoint event log.

Usage: python examples/endurance_report.py runs/endurance/endurance.jsonl
"""

import json
import sys

import numpy as np


def main(path):
    recs = [json.loads(l) for l in open(path)]
    # a kill after the last checkpoint replays some chunks on resume —
    # keep the LAST record per chunk id (the one whose state persisted)
    by_chunk = {}
    for r in recs:
        if r.get("kind") == "chunk":
            by_chunk[r["chunk"]] = r
    chunks = [by_chunk[c] for c in sorted(by_chunk)]
    evals = [r for r in recs if r.get("kind") in ("eval", "final_eval")]
    starts = [r for r in recs if r.get("kind") == "start"]
    ckpts = [r for r in recs if r.get("kind") in ("ckpt", "final_ckpt")]
    if not chunks:
        print("no chunk records")
        return

    sps = np.asarray([c["steps_per_s"] for c in chunks])
    total_steps = max(c["step"] for c in chunks)
    wall = max(c["wall_s"] for c in chunks)
    print(f"## Throughput\n")
    print(f"- total: **{total_steps:,} optimizer steps** in "
          f"{wall/3600:.2f} h training wall-clock ({len(chunks)} chunks)")
    print(f"- steps/s: mean {sps.mean():.1f}, p5 {np.percentile(sps,5):.1f},"
          f" p50 {np.percentile(sps,50):.1f}, p95 "
          f"{np.percentile(sps,95):.1f}, min {sps.min():.1f}")
    drift = (np.mean(sps[-20:]) / np.mean(sps[:20]) - 1) * 100
    print(f"- drift (last-20 vs first-20 chunks): {drift:+.1f}%")
    print(f"- restarts: {len(starts) - 1} "
          f"(resumed={sum(1 for s in starts if s.get('resumed'))}), "
          f"checkpoints written: {len(ckpts)}")

    print(f"\n## Diagnostics trend\n")
    cols = ["step", "d_loss", "g_loss", "first_frame_loss",
            "fake_activation_std", "real_activation_std", "images_std"]
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    idx = np.unique(np.linspace(0, len(chunks) - 1, 14).astype(int))
    for i in idx:
        c = chunks[i]
        row = [f"{c['step']:,}"]
        for k in cols[1:]:
            v = c.get(k)
            row.append(f"{v:.3g}" if v is not None else "-")
        print("| " + " | ".join(row) + " |")

    if evals:
        has_fad = any(e.get("fad") is not None for e in evals)
        print(f"\n## Face-track-rate trend (quality proxy)\n")
        print("| step | tracked/total | rate |" + (" FAD |" if has_fad else ""))
        print("|---|---|---|" + ("---|" if has_fad else ""))
        for e in evals:
            tag = " (final, 256 clips)" if e["kind"] == "final_eval" else ""
            fad = (f" {e['fad']:.2f} |" if has_fad and
                   e.get("fad") is not None else (" - |" if has_fad else ""))
            print((f"| {e['step']:,}{tag} | {e['tracked']}/{e['total']} "
                   f"| {e['rate']:.2f} |" if e.get("rate") is not None else
                   f"| {e['step']:,}{tag} | skipped | - |") + fad)

    events = [r for r in recs if r.get("kind") == "auto_intervention"]
    if events:
        print(f"\n## Collapse-controller interventions "
              f"(train/controller.py, --auto-intervene)\n")
        print("| step | action | d_loss at trigger | noise std | "
              "D-lr scale |")
        print("|---|---|---|---|---|")
        for e in events:
            print(f"| {e['step']:,} | {e['action']} | "
                  f"{e['d_loss']:.2g} | {e['image_noise_std']} | "
                  f"{e['d_lr_scale']} |")

    print(f"\n## Event log\n")
    for s in starts:
        print(f"- start: chunk {s['chunk']}, resumed={s.get('resumed')}, "
              f"prior_wall={s.get('prior_wall_s', 0):.0f}s, "
              f"config={s.get('config')}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "runs/endurance/endurance.jsonl")
