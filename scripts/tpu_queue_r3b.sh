#!/bin/bash
# Sequential TPU job queue for the post-precision-policy measurement
# refresh (late round 3). Waits for the tunnel to recover, then runs
# each job alone (host-CPU contention corrupts slope trials). Safe to
# re-run: every artifact append is labeled by case name.
set -u
cd /root/repo
LOG=/tmp/tpu_queue_r3b.log

probe() {
  timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

echo "$(date +%T) waiting for TPU tunnel..." >> "$LOG"
until probe; do sleep 120; done
echo "$(date +%T) tunnel up" >> "$LOG"

run() {
  echo "=== $(date +%T) $*" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "=== rc=$?" >> "$LOG"
}

# 0. struct A/B: M0 factorization + block apply vs dense (isolated)
run python scripts/scan_slope_bench.py imagenet32_exact_nostruct --ab imagenet32_exact_struct --trials 4
# 1. numerics validation of SOLVE_PRECISION='high' vs f64 oracle
run python scripts/check_solve_precision.py
# 2. fresh slope rows at the adopted defaults
run python scripts/scan_slope_bench.py imagenet32_exact --trials 4
run python scripts/scan_slope_bench.py imagenet32_b1024_remat_exact --k1 2 --k2 10 --trials 4
run python scripts/scan_slope_bench.py glow_mnist --trials 4
run python scripts/scan_slope_bench.py glow_mnist_bf16 --trials 4
# 3. regenerate the bench sweep artifact (slope-method bench.py)
run python bench.py --all
# 4. re-profile the exact production step at the final defaults
run python scripts/profile_step.py --config imagenet32_exact --steps 20 --out results/step_profile_imagenet32_exact.md
run python scripts/annotate_profile.py --config imagenet32_exact --ops results/step_profile_imagenet32_exact_ops.jsonl --out results/step_profile_imagenet32_exact_detail.md
echo "$(date +%T) queue done" >> "$LOG"
