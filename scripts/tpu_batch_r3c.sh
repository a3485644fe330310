#!/usr/bin/env bash
# Recovery of the crashed pipeline tail + same-window layout A/B.
set -u
cd "$(dirname "$0")/.."
while ! grep -q "TPU_BATCH_B_DONE" runs/tpu_batch_r3b.log 2>/dev/null; do sleep 60; done
COMMON=(--dataset-dir runs/ub_structured/data --output-root runs/ub_structured/out)
echo "=== graph test (4.2M structured, 4096 users) $(date -u +%H:%M:%S)"
timeout 4800 python -m nann_tpu.main --job-type test "${COMMON[@]}" --num-test-batch 4096 2>&1 | grep -E "Test Recall|num scoring" 
echo "=== export + verify $(date -u +%H:%M:%S)"
timeout 2400 python -m nann_tpu.main --job-type export "${COMMON[@]}" 2>&1 | tail -2
timeout 2400 python -m nann_tpu.main --job-type verify_export "${COMMON[@]}" 2>&1 | grep -E "verified|Error" | tail -2
echo "STRUCTURED_RECOVERY_DONE $(date -u +%H:%M:%S)"
echo "=== layout A/B (same tunnel window, device-true) $(date -u +%H:%M:%S)"
echo "--- pin ON"
timeout 2400 python bench.py --chained 128 --cost 2>/dev/null | tee runs/bench_pin_on.json
echo "--- pin OFF"
NANN_PIN_LAYOUT=0 timeout 2400 python bench.py --chained 128 --cost 2>/dev/null | tee runs/bench_pin_off.json
echo "TPU_BATCH_C_DONE $(date -u +%H:%M:%S)"
