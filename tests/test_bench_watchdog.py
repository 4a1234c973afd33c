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
    time.sleep(0.05)
    # simulate the compiler persisting a new flagship executable
    new = live / "jit_train_chunk-0123abcd-cache"
    new.write_bytes(b"y" * 64)
    assert bench_mod._flagship_cache_mtime() > baseline
