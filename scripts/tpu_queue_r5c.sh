#!/bin/bash
# Round-5 queue C (waits for r5b): remaining unadjudicated perf knobs.
#  1. spline knot tiling at the flagship (tile vs broadcast — the one
#     flagged-but-unmeasured SplineActivation knob; step is
#     spline-dominated so this is the flagship's biggest open lever)
#  2. bf16 couplings at b4096+remat (b1024 won 1.029x; check the win
#     persists under whole-body remat)
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r5c.log}
while kill -0 "$(cat /tmp/r5bqueue.pid)" 2>/dev/null; do sleep 60; done
echo "$(date +%T) r5b done; starting r5c" >> "$LOG"
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 10800 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
run python scripts/scan_slope_bench.py glow_mnist --ab glow_mnist_splinenat \
    --k1 4 --k2 20
run python scripts/scan_slope_bench.py imagenet32_b4096_remat \
    --ab imagenet32_b4096_remat_bf16 --k1 1 --k2 5
echo "$(date +%T) r5c done" >> "$LOG"
