#!/usr/bin/env bash
# Cap-ceiling probe + device-true ladder (+ 4.2M point when prebuilt).
set -u
cd "$(dirname "$0")/.."
while ! grep -q "TPU_BATCH_D_DONE" runs/tpu_batch_r3d.log 2>/dev/null; do sleep 60; done
COMMON=(--dataset-dir runs/ub_structured/data --output-root runs/ub_structured/out --num-test-batch 4096)
echo "=== D: frontier_cap 16384 $(date -u +%H:%M:%S)"
timeout 4800 python -m nann_tpu.main --job-type test "${COMMON[@]}" \
  --frontier-cap 16384 2>&1 | grep -E "Test Recall|num scoring per hop"
echo "=== ladder device-true (200k/1M/4.2M as available) $(date -u +%H:%M:%S)"
timeout 7200 python scripts/ladder_bench.py --points 200000 1000000 4200000 \
  --chain 30 --out runs/ladder_r3_final.json 2>&1 | grep -v WARNING
echo "TPU_BATCH_E_DONE $(date -u +%H:%M:%S)"
