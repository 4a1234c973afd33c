"""Smoke + resume test for the endurance training script.

examples/endurance_run.py is the long-run driver (VERDICT round-1 item 3:
hours-scale training with diagnostics, checkpoints, kill/resume). This
exercises the whole script end to end on tiny CPU shapes: phase-0 image
GAN, corpus upload through the DeviceCorpus MXU sampler, train chunks,
checkpoint write, and a second invocation that must RESUME from the saved
step instead of starting fresh.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "examples", "endurance_run.py")


def _run(run_dir, max_chunks, extra=()):
    # single-device CPU: drop conftest's 8-device virtual mesh (tiny smoke
    # batches aren't divisible by 8) and the image's axon platform pin
    env = {**os.environ, "JAX_PLATFORMS": "", "XLA_FLAGS": ""}
    return subprocess.run(
        [sys.executable, SCRIPT, "--run-dir", run_dir,
         "--hours", "0.05", "--max-chunks", str(max_chunks),
         "--corpus-clips", "8", "--chunk", "2", "--batch", "2",
         "--img-gan-steps", "1", "--img-gan-batch", "4",
         "--img-gan-dataset", "8", "--dtype", "float32",
         "--platform", "cpu", "--ckpt-every-chunks", "1",
         "--eval-every-chunks", "1000", "--eval-clips", "2",
         "--final-eval-clips", "2", "--fad-frames", "8", *extra],
        capture_output=True, text=True, env=env, timeout=540)


def test_endurance_run_smoke_and_resume(tmp_path):
    run_dir = str(tmp_path / "endurance")

    r1 = _run(run_dir, max_chunks=2)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "fresh start" in r1.stdout

    log_path = os.path.join(run_dir, "endurance.jsonl")
    recs = [json.loads(ln) for ln in open(log_path)]
    chunks = [r for r in recs if r["kind"] == "chunk"]
    assert len(chunks) >= 1
    # collapse diagnostics present on every chunk record
    for r in chunks:
        assert "d_loss" in r and "fake_activation_std" in r

    r2 = _run(run_dir, max_chunks=1)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "RESUMED" in r2.stdout, r2.stdout[-2000:]
    recs2 = [json.loads(ln) for ln in open(log_path)]
    starts = [r for r in recs2 if r["kind"] == "start"]
    assert starts[-1]["resumed"] is True
    # the resumed run continued past the first run's last step
    last1 = max(r["step"] for r in recs if r["kind"] == "chunk")
    last2 = max(r["step"] for r in recs2 if r["kind"] == "chunk")
    assert last2 > last1
    # FAD logged on the final eval (distribution-level health metric)
    finals = [r for r in recs2 if r["kind"] == "final_eval"]
    assert finals and finals[-1]["fad"] is not None
    assert finals[-1]["fad"] >= 0


def test_endurance_auto_intervene_knobs_and_resume(tmp_path):
    """--auto-intervene plumbs the controller's traced knobs through
    train_chunk_ids (chunk records carry the live knob values) and a resume
    recovers the last intervention's levels from the run log."""
    run_dir = str(tmp_path / "endurance_ai")

    r1 = _run(run_dir, max_chunks=2, extra=("--auto-intervene",))
    assert r1.returncode == 0, r1.stderr[-2000:]
    log_path = os.path.join(run_dir, "endurance.jsonl")
    chunks = [json.loads(ln) for ln in open(log_path)]
    chunks = [r for r in chunks if r["kind"] == "chunk"]
    assert chunks
    for r in chunks:  # knob values logged alongside the diagnostics
        assert r["image_noise_std"] == 0.1
        assert r["d_lr_scale"] == 1.0

    # simulate a prior intervention, then resume: the controller must come
    # back at the intervened levels, not the configured base
    with open(log_path, "a") as f:
        f.write(json.dumps({
            "kind": "auto_intervention", "action": "raise_noise",
            "chunk": 2, "step": 4, "d_loss": 0.01,
            "image_noise_std": 0.3, "activation_noise_std": 0.3,
            "d_lr_scale": 0.5}) + "\n")
    # plus: an event from a lost post-checkpoint tail (chunk beyond the
    # restored checkpoint) and a torn last line (kill -9 mid-write) — the
    # resume must ignore both (round-2 ADVICE)
    with open(log_path, "a") as f:
        f.write(json.dumps({
            "kind": "auto_intervention", "action": "raise_noise",
            "chunk": 99, "step": 198, "d_loss": 0.01,
            "image_noise_std": 0.9, "activation_noise_std": 0.9,
            "d_lr_scale": 0.125}) + "\n")
        f.write('{"kind": "chunk", "chu')  # torn tail
    r2 = _run(run_dir, max_chunks=1, extra=("--auto-intervene",))
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "RESUMED" in r2.stdout
    recs2 = [json.loads(ln) for ln in open(log_path)
             if ln.strip().endswith("}")]
    resumed_chunks = [r for r in recs2
                      if r["kind"] == "chunk" and r["chunk"] > 2]
    assert resumed_chunks
    for r in resumed_chunks:
        assert r["image_noise_std"] == 0.3  # not the stale-tail 0.9
        assert r["d_lr_scale"] == 0.5


def test_endurance_early_stop_keeps_best_and_wont_rerun(tmp_path):
    """--early-stop-patience ends the run on a quality plateau, snapshots
    the best periodic eval's checkpoint, scores it at final-eval scale
    (final_eval_best), and a re-invocation refuses to resume a stopped run.

    Determinism: --fad-tie-delta 1e9 makes any second eval non-improving
    (no FAD drop can exceed it, and the junk-GAN track-rate can't move),
    so with patience 1 / warmup 2 the run must stop at exactly eval 2."""
    run_dir = str(tmp_path / "endurance_es")

    r1 = _run(run_dir, max_chunks=6,
              extra=("--eval-every-chunks", "1",
                     "--early-stop-patience", "1",
                     "--early-stop-warmup", "2",
                     "--fad-tie-delta", "1e9"))
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "EARLY STOP" in r1.stdout, r1.stdout[-2000:]
    log_path = os.path.join(run_dir, "endurance.jsonl")
    recs = [json.loads(ln) for ln in open(log_path)]

    stops = [r for r in recs if r["kind"] == "early_stop"]
    assert len(stops) == 1 and stops[0]["chunk"] == 2
    assert stops[0]["best_chunk"] == 1
    # the run ended at the stop, not the --max-chunks budget
    assert max(r["chunk"] for r in recs if r["kind"] == "chunk") == 2

    bests = [r for r in recs if r["kind"] == "quality_best"]
    assert [b["chunk"] for b in bests] == [1]
    best_dir = os.path.join(run_dir, "checkpoints_best")
    assert os.path.isdir(best_dir) and os.listdir(best_dir)

    # the best snapshot (!= final step) was scored at final-eval scale
    finals_best = [r for r in recs if r["kind"] == "final_eval_best"]
    assert len(finals_best) == 1
    assert finals_best[0]["step"] == stops[0]["best_step"]
    assert finals_best[0]["fad"] is not None

    # a stopped run must not train further on re-invocation
    r2 = _run(run_dir, max_chunks=6,
              extra=("--eval-every-chunks", "1",
                     "--early-stop-patience", "1",
                     "--early-stop-warmup", "2",
                     "--fad-tie-delta", "1e9"))
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "already early-stopped" in r2.stdout, r2.stdout[-2000:]
    recs2 = [json.loads(ln) for ln in open(log_path)]
    assert max(r["chunk"] for r in recs2 if r["kind"] == "chunk") == 2
