#!/bin/bash
# Fourth round-4 queue: operator-assembly A/B. Waits for r4c.
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r4d.log}
while kill -0 "$(cat /tmp/r4cqueue.pid)" 2>/dev/null; do sleep 60; done
echo "$(date +%T) r4c done; starting r4d" >> "$LOG"
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
run python scripts/scan_slope_bench.py imagenet32_exact_asmgather --ab imagenet32_exact_asmein --trials 4
run python scripts/scan_slope_bench.py imagenet32_b1024_remat_exact_asmgather --ab imagenet32_b1024_remat_exact_asmein --k1 2 --k2 10 --trials 4
echo "$(date +%T) r4d done" >> "$LOG"
