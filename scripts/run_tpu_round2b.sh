#!/bin/bash
# Round-2 follow-up TPU pass: TUM re-measure with the aligned chunked
# kernels, iMAP retry (first attempt hit a transient device UNAVAILABLE),
# decoder matmul-precision study, pretrained-mode Demo soak.
set -u
LOG=${1:-/tmp/tpu_round2b.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "${STEP_TIMEOUT:-1500}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run python scripts/bench_sync_modes.py 100 strict loose free
run python scripts/bench_tum.py
run python scripts/bench_imap.py 100
run python scripts/bench_precision.py 60
run python scripts/bench_demo.py 500 --pretrained
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
