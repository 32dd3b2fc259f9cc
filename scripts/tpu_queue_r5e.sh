#!/bin/bash
# Round-5 queue E (waits for r5d): validate the driver's exact bench
# contract on the live chip and regenerate the mechanical A/B digest.
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r5e.log}
while kill -0 "$(cat /tmp/r5dqueue.pid)" 2>/dev/null; do sleep 60; done
echo "$(date +%T) r5d done; starting r5e" >> "$LOG"
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 3600 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
run python bench.py
run python scripts/summarize_slopes.py
echo "$(date +%T) r5e done" >> "$LOG"
