#!/bin/bash
# Tenth round-4 queue: rowflat confirmation at flagship + b1024-remat,
# then fresh all-adoptions headline rows. Waits for r4i.
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r4j.log}
while kill -0 "$(cat /tmp/r4iqueue.pid)" 2>/dev/null; do sleep 60; done
echo "$(date +%T) r4i done; starting r4j" >> "$LOG"
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
run python scripts/scan_slope_bench.py glow_mnist_rowein --ab glow_mnist_rowflat --trials 4
run python scripts/scan_slope_bench.py imagenet32_exact --trials 4
run python scripts/scan_slope_bench.py imagenet32_b1024_remat_exact --k1 2 --k2 10 --trials 4
echo "$(date +%T) r4j done" >> "$LOG"
