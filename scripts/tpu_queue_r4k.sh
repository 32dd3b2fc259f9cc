#!/bin/bash
# Eleventh round-4 queue: coupling-remat at the flagship; all-adoptions
# headline row. Waits for r4j.
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r4k.log}
while kill -0 "$(cat /tmp/r4jqueue.pid)" 2>/dev/null; do sleep 60; done
echo "$(date +%T) r4j done; starting r4k" >> "$LOG"
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
run python scripts/scan_slope_bench.py glow_mnist_cplstash --ab glow_mnist_cplremat --trials 4
run python scripts/scan_slope_bench.py imagenet32_exact_cplremat --trials 4
echo "$(date +%T) r4k done" >> "$LOG"
