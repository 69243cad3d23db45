#!/bin/bash
# Consolidated TPU measurement pass (fire when the chip is healthy).
# Each step appends to /tmp/tpu_measurements.log and tolerates failures.
set -u
LOG=${1:-/tmp/tpu_measurements.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "${STEP_TIMEOUT:-1800}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run python scripts/bench_imap.py 100
run python scripts/bench_tum.py
run python bench.py
run python scripts/bench_sync_modes.py 100 strict loose
run python scripts/bench_fused_eval.py 256
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
