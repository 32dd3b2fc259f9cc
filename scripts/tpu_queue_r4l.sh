#!/bin/bash
# Twelfth round-4 queue: production-batch (b1024+remat) profile +
# source attribution. Waits for r4k.
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r4l.log}
while kill -0 "$(cat /tmp/r4kqueue.pid)" 2>/dev/null; do sleep 60; done
echo "$(date +%T) r4k done; starting r4l" >> "$LOG"
run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}
run python scripts/profile_step.py --config imagenet32_b1024 --steps 8 \
    --out results/step_profile_imagenet32_b1024.md
run python scripts/annotate_profile.py --config imagenet32_b1024 \
    --ops results/step_profile_imagenet32_b1024_ops.jsonl \
    --out results/step_profile_imagenet32_b1024_detail.md
echo "$(date +%T) r4l done" >> "$LOG"
