#!/bin/bash
# Third round-4 queue: same-session adjudications that earlier rows
# left open. Waits for tpu_queue_r4b.sh.
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r4c.log}
while kill -0 "$(cat /tmp/r4bqueue.pid)" 2>/dev/null; do sleep 60; done
echo "$(date +%T) r4b done; starting r4c" >> "$LOG"
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
# flagship bf16 couplings: same-session verdict (cross-process rows
# disagree with the round-3 1.33x same-session win)
run python scripts/scan_slope_bench.py glow_mnist --ab glow_mnist_bf16 --trials 4
# jacobi units at production scale vs the exact solve
run python scripts/scan_slope_bench.py imagenet32_exact --ab imagenet32_jacobi --trials 4
# fresh headline at the adopted defaults (chainbatch now on)
run python scripts/scan_slope_bench.py imagenet32_exact --trials 4
echo "$(date +%T) r4c done" >> "$LOG"
