#!/bin/bash
# Fixup queue: waits for tpu_queue_r4.sh to finish, then re-runs the
# eval-direction A/Bs (first attempt crashed: Dequantization needed an
# rng in the eval scan body — fixed in scan_slope_bench.py) plus a
# repeat calibration-stability probe (bf16 + f32 matmul chains).
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r4b.log}
while kill -0 "$(cat /tmp/r4queue.pid)" 2>/dev/null; do sleep 60; done
echo "$(date +%T) r4 queue done; starting fixups" >> "$LOG"
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
run python scripts/scan_slope_bench.py imagenet32_eval_exact --ab imagenet32_eval_fused --trials 4
run python scripts/scan_slope_bench.py glow_mnist_units_eval_exact --ab glow_mnist_units_eval_fused --trials 4
run python scripts/scan_slope_bench.py matmul_f32 --trials 4
run python scripts/scan_slope_bench.py matmul_bf16 --trials 4
echo "$(date +%T) r4b queue done" >> "$LOG"
