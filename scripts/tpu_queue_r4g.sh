#!/bin/bash
# Seventh round-4 queue: rerun the (now-fixed) eval/sampling-direction
# fused adjudication A/Bs.
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r4g.log}
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
run python scripts/scan_slope_bench.py imagenet32_eval_exact --ab imagenet32_eval_fused --trials 4
run python scripts/scan_slope_bench.py glow_mnist_units_eval_exact --ab glow_mnist_units_eval_fused --trials 4
echo "$(date +%T) r4g done" >> "$LOG"
