#!/bin/bash
# Round-5 queue A: VERDICT r4 perf items.
#  1. bf16-couplings at b1024 re-confirmation (adjudication gate)
#  2. fresh b4096+remat with all round-4 adoptions
#  3. solver='auto' policy end-to-end A/Bs at the timescaling shapes
#     (B = auto arm, so "B wins" == the policy engaged the win)
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r5a.log}
echo "$(date +%T) r5a start" >> "$LOG"
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
run python scripts/scan_slope_bench.py imagenet32_b1024 \
    --ab imagenet32_b1024_bf16 --k1 2 --k2 10
run python scripts/scan_slope_bench.py imagenet32_b4096_remat --k1 1 --k2 5
run python scripts/scan_slope_bench.py timescale_tall_h128 \
    --ab timescale_auto_tall_h128 --k1 8 --k2 520 \
    --out results/timescale_slope.jsonl
run python scripts/scan_slope_bench.py timescale_tall_h512 \
    --ab timescale_auto_tall_h512 --k1 8 --k2 520 \
    --out results/timescale_slope.jsonl
run python scripts/scan_slope_bench.py timescale_s32 \
    --ab timescale_auto_s32 --k1 8 --k2 520 \
    --out results/timescale_slope.jsonl
run python scripts/scan_slope_bench.py timescale_tall_h2048 \
    --ab timescale_auto_tall_h2048 --k1 8 --k2 520 \
    --out results/timescale_slope.jsonl
echo "$(date +%T) r5a done" >> "$LOG"
