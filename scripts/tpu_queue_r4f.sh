#!/bin/bash
# Sixth round-4 queue: the never-run eval/sampling-direction fused
# adjudication (VERDICT r3 item 5) + a fresh profile at the current
# 48 ms imagenet32_exact defaults to find the next line item.
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r4f.log}
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
run python scripts/scan_slope_bench.py imagenet32_eval_exact --ab imagenet32_eval_fused --trials 4
run python scripts/scan_slope_bench.py glow_mnist_units_eval_exact --ab glow_mnist_units_eval_fused --trials 4
run python scripts/profile_step.py --config imagenet32_exact --steps 30
echo "$(date +%T) r4f done" >> "$LOG"
