#!/bin/bash
# Round-2 final TPU pass (persistent cache disabled on TPU): TUM with the
# roll-based chunked kernels, iMAP after the regulation restructure,
# precision study, honest sync-mode numbers, pretrained Demo soak.
set -u
LOG=${1:-/tmp/tpu_round2c.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "${STEP_TIMEOUT:-1500}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run python scripts/bench_tum.py
run python scripts/bench_imap.py 100
run python scripts/bench_precision.py 60
run python bench.py
run python scripts/bench_sync_modes.py 60 strict loose
run python scripts/bench_demo.py 500 --pretrained
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
