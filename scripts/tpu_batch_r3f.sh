#!/usr/bin/env bash
# Time-boxed FGSM phase-A screen (VERDICT r2 item 7): default-knobs oracle at
# the 10k-step checkpoint vs eps 1e-3 trained 10k steps — same steps, same
# corpus, oracle-ceiling comparison.
set -u
cd "$(dirname "$0")/.."
DATA=runs/ub_structured/data
D10=runs/fgsm/default_10k
echo "=== default (eps 3e-5 w1) oracle @step10001 $(date -u +%H:%M:%S)"
mkdir -p "$D10/model"
[ -d "$D10/model/step_10001" ] || cp -r runs/ub_structured/out/model/step_10001 "$D10/model/"
timeout 2400 python -m nann_tpu.main --job-type extract_feature \
  --dataset-dir "$DATA" --output-root "$D10" 2>&1 | tail -1
timeout 2400 python -m nann_tpu.main --job-type test_all --dataset-dir "$DATA" \
  --output-root "$D10" --num-test-batch 1024 2>&1 | grep -E "Test-all"
echo "=== eps 1e-3 w1: train 10k + extract + oracle $(date -u +%H:%M:%S)"
OUT=runs/fgsm/e1e-3_w1
mkdir -p "$OUT"
timeout 4200 python -m nann_tpu.main --job-type train --dataset-dir "$DATA" \
  --output-root "$OUT" --max-steps 10000 --save-freq 10000 --print-freq 2000 \
  --adv-eps 1e-3 --adv-weight 1 2>&1 | tail -2
timeout 2400 python -m nann_tpu.main --job-type extract_feature \
  --dataset-dir "$DATA" --output-root "$OUT" --adv-eps 1e-3 2>&1 | tail -1
timeout 2400 python -m nann_tpu.main --job-type test_all --dataset-dir "$DATA" \
  --output-root "$OUT" --num-test-batch 1024 --adv-eps 1e-3 2>&1 | grep -E "Test-all"
echo "FGSM_SCREEN_PARTIAL_DONE $(date -u +%H:%M:%S)"
