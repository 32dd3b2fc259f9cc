#!/bin/bash
# Round-5 queue F: refresh the b4096 sweep row under its adopted bf16
# default, and validate the dual-calibration driver contract.
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r5f.log}
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
run python bench.py --config imagenet32_b4096
run python bench.py
echo "$(date +%T) r5f done" >> "$LOG"
