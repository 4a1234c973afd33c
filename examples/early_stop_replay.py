"""Offline validation of the quality-plateau early-stop policy: feed a
recorded endurance run's eval trace through train/early_stop.py and report
where the policy WOULD have stopped, which checkpoint it would have kept,
and how much of the budget it would have saved.

This is the zero-TPU-cost counterpart of running a new endurance job with
--early-stop-patience: the policy is a pure function of the eval log, so
replaying runs 3/4's committed traces tests it against the exact quality
trajectories that motivated it (docs/ENDURANCE.md: run 3 eroded past its
peak, run 4 plateaued at 100% with FAD as the only live signal).

Usage:
  python examples/early_stop_replay.py runs/endurance3/endurance.jsonl \
      --patience 3 --warmup 3
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gifgan_tpu.train.early_stop import (EarlyStopConfig, QualityEarlyStop,
                                         replay_eval_log)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log", help="endurance.jsonl to replay")
    p.add_argument("--patience", type=int, default=3)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--fad-tie-delta", type=float, default=0.0)
    args = p.parse_args()

    policy = QualityEarlyStop(EarlyStopConfig(
        patience=args.patience, warmup_evals=args.warmup,
        fad_tie_delta=args.fad_tie_delta))
    events = replay_eval_log(args.log, policy)

    last_step = last_wall = 0
    with open(args.log) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if "step" in rec:
                last_step = max(last_step, rec["step"])
            if "wall_s" in rec:
                last_wall = max(last_wall, rec["wall_s"])

    stop = next((e for e in events if e["kind"] == "early_stop"), None)
    out = {
        "log": args.log,
        "evals": policy.evals,
        "events": events,
        "best_step": policy.best_step,
        "best_rate": policy.best_rate,
        "best_fad": policy.best_fad,
        "would_stop_at_step": stop["step"] if stop else None,
        "actual_final_step": last_step,
        "steps_saved_pct": (round(100 * (1 - stop["step"] / last_step), 1)
                            if stop and last_step else 0.0),
        "actual_wall_s": round(last_wall, 1),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
