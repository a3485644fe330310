#!/usr/bin/env bash
# Parity gap analysis at 4.2M (graph side, fixed checkpoint, oracle=57.42%).
set -u
cd "$(dirname "$0")/.."
while ! grep -q "TPU_BATCH_C_DONE" runs/tpu_batch_r3c.log 2>/dev/null; do sleep 60; done
COMMON=(--dataset-dir runs/ub_structured/data --output-root runs/ub_structured/out --num-test-batch 4096)
echo "=== A: frontier_cap 8192 $(date -u +%H:%M:%S)"
timeout 4800 python -m nann_tpu.main --job-type test "${COMMON[@]}" \
  --frontier-cap 8192 2>&1 | grep -E "Test Recall|num scoring per hop"
echo "=== B: 2x budget (top-k 800/400/200) $(date -u +%H:%M:%S)"
timeout 4800 python -m nann_tpu.main --job-type test "${COMMON[@]}" \
  --top-k-per-level 800 400 200 2>&1 | grep -E "Test Recall|num scoring per hop"
echo "=== C: both $(date -u +%H:%M:%S)"
timeout 4800 python -m nann_tpu.main --job-type test "${COMMON[@]}" \
  --frontier-cap 8192 --top-k-per-level 800 400 200 2>&1 | grep -E "Test Recall|num scoring per hop"
echo "TPU_BATCH_D_DONE $(date -u +%H:%M:%S)"
