#!/bin/bash
# Round-5 queue B (waits for r5a): second-real-dataset on-chip BPD
# trajectory + fresh full bench sweep (adds imagenet32_b4096, roofline
# fields, better-sampled production sampling latency).
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r5b.log}
while kill -0 "$(cat /tmp/r5aqueue.pid)" 2>/dev/null; do sleep 60; done
echo "$(date +%T) r5a done; starting r5b" >> "$LOG"
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 10800 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
run python scripts/train_real_patches.py --epochs 40
run python bench.py --all
echo "$(date +%T) r5b done" >> "$LOG"
