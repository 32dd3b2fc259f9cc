#!/bin/bash
# Eighth round-4 queue: slope A/Bs for the two profile-driven
# formatting-cut restructures (BUILT_APPLY blocks, ROW_MATS_FLAT).
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r4h.log}
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
run python scripts/scan_slope_bench.py imagenet32_exact_builtdense --ab imagenet32_exact_builtblk --trials 4
run python scripts/scan_slope_bench.py imagenet32_exact_rowein --ab imagenet32_exact_rowflat --trials 4
echo "$(date +%T) r4h done" >> "$LOG"
