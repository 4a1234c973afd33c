"""Quality-plateau early stopping (train/early_stop.py).

The policy automates the judgement endurance runs 3-4 made by hand
(docs/ENDURANCE.md: run 3's proxy declined in its second hour; run 4
finished best at half the budget): stop when the periodic track-rate/FAD
evals plateau, keep the best eval's checkpoint. Pure host-side logic —
tested on synthetic eval traces, including the exact shapes of the
recorded runs, plus log-replay state recovery (the resume contract).
"""

import json

from gifgan_tpu.train.early_stop import (EarlyStopConfig, QualityEarlyStop,
                                         replay_eval_log)


def _policy(patience=3, warmup=2, fad_tie_delta=0.0):
    return QualityEarlyStop(EarlyStopConfig(
        patience=patience, warmup_evals=warmup, fad_tie_delta=fad_tie_delta))


def _feed(policy, trace):
    """trace: list of (rate, fad); returns (events, stop_index or None)."""
    events = []
    for i, (rate, fad) in enumerate(trace):
        ev = policy.observe(rate, fad, chunk=i + 1, step=(i + 1) * 100)
        if ev is not None:
            events.append(ev)
            if ev["kind"] == "early_stop":
                return events, i
    return events, None


def test_improving_trace_never_stops():
    p = _policy(patience=2, warmup=1)
    trace = [(r / 32, 5.0 - r / 10) for r in range(10, 30)]
    events, stop = _feed(p, trace)
    assert stop is None and not p.stopped
    assert all(e["kind"] == "quality_best" for e in events)
    assert p.best_rate == 29 / 32


def test_plateau_stops_after_patience():
    p = _policy(patience=3, warmup=2)
    #      best @idx1         then 3 flat evals -> stop at idx 4
    trace = [(0.5, 3.0), (0.7, 3.0), (0.7, 3.0), (0.7, 3.0), (0.7, 3.0)]
    events, stop = _feed(p, trace)
    assert stop == 4 and p.stopped
    ev = events[-1]
    assert ev["kind"] == "early_stop"
    assert ev["best_chunk"] == 2 and ev["best_rate"] == 0.7
    assert ev["since_best"] == 3


def test_erosion_stops_and_best_is_the_peak():
    """Run 3's shape: quality peaks then declines — the policy must stop
    and point at the peak, not the end."""
    rates = [0.6, 0.8, 0.9, 0.84, 0.72, 0.66, 0.75]
    p = _policy(patience=3, warmup=2)
    events, stop = _feed(p, [(r, None) for r in rates])
    assert stop == 5  # three non-improving evals after the 0.9 peak
    assert p.best_rate == 0.9 and p.best_chunk == 3


def test_fad_breaks_rate_ties():
    """Run 4's shape: the proxy saturates at 100% — FAD is the only live
    signal, and a lower FAD at a tied rate must count as improvement."""
    p = _policy(patience=2, warmup=1)
    trace = [(1.0, 3.5), (1.0, 3.0), (1.0, 2.7), (1.0, 2.9), (1.0, 2.9)]
    events, stop = _feed(p, trace)
    assert stop == 4
    assert p.best_fad == 2.7 and p.best_chunk == 3
    # equal FAD at equal rate is NOT an improvement
    assert sum(e["kind"] == "quality_best" for e in events) == 3


def test_fad_tie_delta_requires_material_improvement():
    p = _policy(patience=2, warmup=1, fad_tie_delta=0.5)
    trace = [(1.0, 3.0), (1.0, 2.8), (1.0, 2.6)]  # drops of 0.2 < delta
    events, stop = _feed(p, trace)
    assert stop == 2  # the small FAD drips never reset the patience clock
    assert p.best_fad == 3.0


def test_warmup_blocks_early_judgement():
    p = _policy(patience=1, warmup=5)
    trace = [(0.5, None)] * 4  # plateau from eval 2, but warmup=5
    _, stop = _feed(p, trace)
    assert stop is None
    ev = p.observe(0.5, None, chunk=5, step=500)
    assert ev is not None and ev["kind"] == "early_stop"


def test_fad_only_mode_without_detector():
    p = _policy(patience=2, warmup=1)
    trace = [(None, 5.0), (None, 4.0), (None, 4.2), (None, 4.1)]
    events, stop = _feed(p, trace)
    assert stop == 3
    assert p.best_fad == 4.0 and p.best_chunk == 2


def test_signalless_evals_are_ignored():
    p = _policy(patience=1, warmup=1)
    for _ in range(10):
        assert p.observe(None, None, chunk=1, step=1) is None
    assert p.evals == 0 and not p.stopped


def test_stopped_policy_is_inert():
    p = _policy(patience=1, warmup=1)
    _feed(p, [(0.5, None), (0.5, None), (0.5, None)])
    assert p.stopped
    assert p.observe(1.0, None, chunk=9, step=900) is None
    assert p.best_rate == 0.5  # no state movement after stop


def test_replay_recovers_live_state(tmp_path):
    """Resume contract: replaying the log's eval records reproduces the
    live policy's state exactly — including best-so-far and the
    evals-since-best clock — while skipping non-eval records, records past
    the restored chunk, and a torn trailing line."""
    trace = [(0.5, 4.0), (0.8, 3.5), (0.75, 3.6), (0.7, 3.8), (0.72, 3.7)]
    live = _policy(patience=10, warmup=1)
    for i, (rate, fad) in enumerate(trace):
        live.observe(rate, fad, chunk=(i + 1) * 150, step=(i + 1) * 150 * 80)

    log = tmp_path / "endurance.jsonl"
    with open(log, "w") as f:
        f.write(json.dumps({"kind": "start", "chunk": 0}) + "\n")
        for i, (rate, fad) in enumerate(trace):
            c = (i + 1) * 150
            f.write(json.dumps({"kind": "chunk", "chunk": c,
                                "d_loss": 0.01}) + "\n")
            f.write(json.dumps({"kind": "eval", "chunk": c, "step": c * 80,
                                "rate": rate, "fad": fad,
                                "tracked": int(rate * 32),
                                "total": 32}) + "\n")
        # eval belonging to a lost tail past the restored checkpoint
        f.write(json.dumps({"kind": "eval", "chunk": 900, "step": 72000,
                            "rate": 0.99, "fad": 1.0}) + "\n")
        f.write('{"kind": "eval", "chunk": 1050, "ra')  # torn mid-write

    replayed = _policy(patience=10, warmup=1)
    replay_eval_log(str(log), replayed, upto_chunk=750)
    assert replayed == live
    assert replayed.best_chunk == 300 and replayed.since_best == 3


def test_replay_missing_file_is_noop():
    p = _policy()
    assert replay_eval_log("/nonexistent/endurance.jsonl", p) == []
    assert p.evals == 0
