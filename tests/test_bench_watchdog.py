"""Regression tests for bench.py's parent-side watchdog cache baseline.

The failure being pinned (first round-3 driver-style run, 2026-08-20): the
CHILD process used to copy the repo-committed cache seed into the live
cache at startup, so the seeded entries landed with fresh mtimes *after*
the parent snapshotted its baseline. The parent's post-compile-stall rule
(`new_mtime > cache_mtime_before and now - new_mtime > 120`) then read the
seed copy as "the compile just finished" and killed a child that was
legitimately 50-300 s into the warm executable load — both attempts
failed and the round's bench budget was exhausted without a measurement.

The fix: the PARENT seeds the cache and only then snapshots the baseline
(bench._snapshot_cache_baseline), so the baseline includes the seed and
only a genuinely compile-written entry can arm the stall rule.
"""

import importlib.util
import os
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench_mod():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def fake_dirs(tmp_path, monkeypatch):
    from gifgan_tpu.core import cache as cache_mod

    seed = tmp_path / "seed"
    live = tmp_path / "live"
    seed.mkdir()
    (seed / "jit_train_chunk-deadbeef-cache").write_bytes(b"x" * 64)
    monkeypatch.setattr(cache_mod, "SEED_DIR", str(seed))
    monkeypatch.setattr(cache_mod, "DEFAULT_CACHE_DIR", str(live))
    return seed, live


def test_baseline_includes_seeded_entries(bench_mod, fake_dirs):
    seed, live = fake_dirs
    baseline = bench_mod._snapshot_cache_baseline()
    # the seed copy happened and the baseline covers it
    assert (live / "jit_train_chunk-deadbeef-cache").exists()
    assert baseline > 0
    # the stall-rule arming condition must be FALSE right after seeding:
    # nothing newer than the baseline exists
    assert not (bench_mod._flagship_cache_mtime() > baseline)


def test_reseeding_does_not_bump_mtime(bench_mod, fake_dirs):
    _, live = fake_dirs
    baseline = bench_mod._snapshot_cache_baseline()
    time.sleep(0.05)
    again = bench_mod._snapshot_cache_baseline()
    # seed_cache_from_repo skips existing files, so a second parent
    # attempt sees the same baseline, not a fresh copy
    assert again == baseline


def test_fresh_compile_entry_arms_stall_rule(bench_mod, fake_dirs):
    _, live = fake_dirs
    baseline = bench_mod._snapshot_cache_baseline()
    # simulate the compiler persisting a new flagship executable; set the
    # mtime explicitly so the assertion never depends on filesystem mtime
    # granularity (round-3 advisor: 1s-granularity filesystems can flake a
    # sleep-based gap)
    new = live / "jit_train_chunk-0123abcd-cache"
    new.write_bytes(b"y" * 64)
    os.utime(new, (baseline + 10, baseline + 10))
    assert bench_mod._flagship_cache_mtime() > baseline


# ----- _watch_verdict: the kill policy as a pure function -------------------
#
# Round-3 driver failure being pinned: the seeded child sat 425 s past
# "data" (either a hung warm load or an unfinishable cold compile) and the
# old policy had no way to tell, so one attempt consumed the whole budget.
# The child now forwards jax's persistent-cache hit/miss log line into the
# stage file; `cache_hit` bounds the in-flight operation (warm load
# <= _WARM_LOAD_DEADLINE_S) and arms an early kill whose retry is warm.

def _stages(t0, **offsets):
    return {name: t0 + dt for name, dt in offsets.items()}


def test_verdict_budget_exhausted(bench_mod):
    assert "budget" in bench_mod._watch_verdict(
        1000.0 + 500.0, 1000.0, 450.0, {}, 0.0, 0.0)


def test_verdict_cheap_stage_deadline(bench_mod):
    t0 = 1000.0
    # nothing reached after 40 s: the 'imports' deadline (35 s) has passed
    v = bench_mod._watch_verdict(t0 + 40, t0, 450.0, {}, 0.0, 0.0)
    assert v and "imports" in v
    # 'device' reached, but 'dispatched' (120 s) missed at 130 s
    v = bench_mod._watch_verdict(
        t0 + 130, t0, 450.0, _stages(t0, imports=8, device=20), 0.0, 0.0)
    assert v and "dispatched" in v


def test_verdict_warm_hang_killed_after_cache_hit(bench_mod):
    t0 = 1000.0
    st = _stages(t0, imports=8, device=10, dispatched=15, cache_hit=20,
                 init=40, data=41)
    # 200 s after the hit: still within the warm-load bound -> let it run
    assert bench_mod._watch_verdict(t0 + 220, t0, 450.0, st, 5.0, 5.0) is None
    # past the bound -> the relay hang; kill (retry will be warm)
    v = bench_mod._watch_verdict(t0 + 20 + 261, t0, 450.0, st, 5.0, 5.0)
    assert v and "warm load" in v


def test_verdict_cold_compile_never_timer_killed(bench_mod):
    t0 = 1000.0
    st = _stages(t0, imports=8, device=10, dispatched=15, cache_miss=20,
                 init=40, data=41)
    # 400 s into a cold compile with no fresh cache entry: must NOT kill
    assert bench_mod._watch_verdict(t0 + 400, t0, 450.0, st, 5.0, 5.0) is None


def test_verdict_post_compile_stall_still_applies(bench_mod):
    t0 = 1000.0
    st = _stages(t0, imports=8, device=10, dispatched=15, cache_miss=20,
                 init=40, data=41)
    # compile finished (fresh entry at t0+300), child silent 130 s after
    v = bench_mod._watch_verdict(t0 + 430, t0, 450.0, st, 5.0, t0 + 300)
    assert v and "compile finished" in v


def test_verdict_probe_marks_do_not_mask_pipeline_stage(bench_mod):
    # a cache_miss logged after 'data' must not push the policy into the
    # budget-only branch: the stall rule still keys off reached == 'data'
    t0 = 1000.0
    st = _stages(t0, imports=8, device=10, dispatched=15, init=40, data=41,
                 cache_miss=45)
    v = bench_mod._watch_verdict(t0 + 430, t0, 450.0, st, 5.0, t0 + 300)
    assert v and "compile finished" in v


def test_parse_stages_reads_marks_and_tolerates_junk(bench_mod, tmp_path):
    p = tmp_path / "status"
    p.write_text("1000.5 imports\n1002.0 device\nnot-a-line\n"
                 "1003.0 cache_hit\n1003.5 cache_hit\n")
    seen = bench_mod._parse_stages(str(p))
    assert seen == {"imports": 1000.5, "device": 1002.0, "cache_hit": 1003.0}
    assert bench_mod._parse_stages(str(tmp_path / "missing")) == {}


def test_postmortem_journal_appends(bench_mod, tmp_path, monkeypatch):
    pm = tmp_path / "BENCH_postmortem.jsonl"
    monkeypatch.setattr(bench_mod, "POSTMORTEM_PATH", str(pm))
    bench_mod._write_postmortem({"attempt": 1, "outcome": "killed: x",
                                 "stages": ["1000.0 imports"]})
    bench_mod._write_postmortem({"attempt": 2, "outcome": "ok",
                                 "result": {"value": 40.7}})
    import json
    lines = [json.loads(ln) for ln in pm.read_text().splitlines()]
    assert [ln["attempt"] for ln in lines] == [1, 2]
    assert lines[0]["outcome"].startswith("killed")
    assert lines[1]["result"]["value"] == 40.7
    assert all("t" in ln for ln in lines)
