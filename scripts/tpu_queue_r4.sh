#!/bin/bash
# Sequential TPU job queue for round 4 (VERDICT r3 items 2-6). Runs
# each job alone (host-CPU contention corrupts slope trials); every
# artifact append is labeled by case name so re-runs are safe.
set -u
cd /root/repo
LOG=${LOG:-/tmp/tpu_queue_r4.log}

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

# 1. batched-build chain A/B (adjudicate UNIT_CHAIN_BATCHED default)
run python scripts/scan_slope_bench.py imagenet32_exact_nochainbatch --ab imagenet32_exact_chainbatch --trials 4
# 2. fused Pallas kernel's last claimed niche: forward/sampling direction
run python scripts/scan_slope_bench.py imagenet32_eval_exact --ab imagenet32_eval_fused --trials 4
run python scripts/scan_slope_bench.py glow_mnist_units_eval_exact --ab glow_mnist_units_eval_fused --trials 4
# 3. fresh calibrated headline rows at adopted defaults
run python scripts/scan_slope_bench.py glow_mnist --trials 4
run python scripts/scan_slope_bench.py glow_mnist_bf16 --trials 4
run python scripts/scan_slope_bench.py imagenet32_b1024_remat_exact --k1 2 --k2 10 --trials 4
# 4. re-profile the production step at the final defaults (next perf target)
run python scripts/profile_step.py --config imagenet32_exact --steps 20 --out results/step_profile_imagenet32_exact.md
run python scripts/annotate_profile.py --config imagenet32_exact --ops results/step_profile_imagenet32_exact_ops.jsonl --out results/step_profile_imagenet32_exact_detail.md
# 5. timescaling story (Fig. 4 analogue), slope method, exact vs Jacobi.
#    Wide K spread: per-step times are 0.1-3 ms, so K2-K1=512 steps makes
#    the slope signal ~50x the dispatch jitter that voided round 2's curves.
for c in timescale_s16 timescale_s32 timescale_s64 timescale_s128 \
         timescale_jac_s16 timescale_jac_s32 timescale_jac_s64 timescale_jac_s128 \
         timescale_tall_h128 timescale_tall_h512 timescale_tall_h2048 \
         timescale_jac_tall_h128 timescale_jac_tall_h512 timescale_jac_tall_h2048; do
  run python scripts/scan_slope_bench.py "$c" --k1 8 --k2 520 --trials 4 --out results/timescale_slope.jsonl
done
# 6. regenerate the bench sweep artifact (slope-method bench.py)
run python bench.py --all
echo "$(date +%T) queue done" >> "$LOG"
