#!/bin/bash
# Round-3 TPU measurement pass: everything BASELINE.md's round-3 section
# records, in dependency order.  Each step appends to $LOG.
#   bench_imap / bench_precision need the chunked mapping pass
#   (mapping.max_rays_per_pass) — the monolithic 5000-ray iMAP program
#   faults on the current stack (BASELINE.md).
set -u
LOG=${1:-/tmp/tpu_round3.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "${STEP_TIMEOUT:-1800}" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}
run python scripts/bench_tum.py                     # f32 row
NSTPU_MM_PRECISION=bfloat16 run python scripts/bench_tum.py   # bf16 row
run python scripts/bench_imap.py 100
run python scripts/bench_imap_e2e.py
run python scripts/bench_precision.py 60
run python bench.py
run python bench.py
run python bench.py                                 # 3x: reproducibility
run python scripts/bench_sync_modes.py 60 strict loose free
run python scripts/bench_demo.py 200 --sync=strict  # drift attribution
run python scripts/bench_demo.py 200
run python scripts/bench_demo.py 500 --pretrained
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
