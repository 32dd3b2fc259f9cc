#!/bin/bash
# Fifth round-4 queue: production-scale precision oracle. Waits for r4d.
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r4e.log}
while kill -0 "$(cat /tmp/r4dqueue.pid)" 2>/dev/null; do sleep 60; done
echo "$(date +%T) r4d done; starting r4e" >> "$LOG"
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
run python scripts/check_solve_precision.py
echo "$(date +%T) r4e done" >> "$LOG"
