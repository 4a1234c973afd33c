#!/bin/bash
# Supervisor for endurance_run.py on the axon relay: the relay occasionally
# returns transient RESOURCE_EXHAUSTED / hangs (see CLAUDE.md); the run
# script checkpoints + resumes exactly, so the recovery story is
# "restart the process", not in-process retry (train_chunk donates the
# train state, so a failed dispatch may have consumed the old buffers).
#
# Usage: endurance_supervise.sh <run-dir> <hours> <noise> [extra args...]
set -u
RUN_DIR=$1; HOURS=$2; NOISE=$3; shift 3
for attempt in 1 2 3 4 5; do
  python examples/endurance_run.py --run-dir "$RUN_DIR" --hours "$HOURS" \
    --image-noise "$NOISE" --activation-noise "$NOISE" "$@" && exit 0
  echo "[supervise] attempt $attempt failed (rc=$?); sleeping 60s" >&2
  sleep 60
done
echo "[supervise] giving up after 5 attempts" >&2
exit 1
