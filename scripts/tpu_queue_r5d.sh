#!/bin/bash
# Round-5 queue D (waits for r5c): rows-per-block sweep at the
# production config — the one solve-blocking knob never measured.
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r5d.log}
while kill -0 "$(cat /tmp/r5cqueue.pid)" 2>/dev/null; do sleep 60; done
echo "$(date +%T) r5c done; starting r5d" >> "$LOG"
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
run python scripts/scan_slope_bench.py imagenet32_exact_rdefault \
    --ab imagenet32_exact_r4 --k1 4 --k2 20
run python scripts/scan_slope_bench.py imagenet32_exact_rdefault \
    --ab imagenet32_exact_r8 --k1 4 --k2 20
echo "$(date +%T) r5d done" >> "$LOG"
