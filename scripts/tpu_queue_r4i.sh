#!/bin/bash
# Ninth round-4 queue: coupling-net remat A/B. Waits for r4h.
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r4i.log}
while kill -0 "$(cat /tmp/r4hqueue.pid)" 2>/dev/null; do sleep 60; done
echo "$(date +%T) r4h done; starting r4i" >> "$LOG"
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
run python scripts/scan_slope_bench.py imagenet32_exact_cplstash --ab imagenet32_exact_cplremat --trials 4
echo "$(date +%T) r4i done" >> "$LOG"
