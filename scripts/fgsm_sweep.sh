#!/usr/bin/env bash
# FGSM per-regime tuning on the structured 4.2M corpus (VERDICT r2 item 7).
#
# Phase A (this script): screen eps x weight by the ORACLE ceiling — train
# 10k steps per config on the structured corpus, extract 4.2M embeddings,
# brute-force oracle recall@200 (job test_all; no index build needed).
# The default config (eps 3e-5, w 1) needs no retrain: the main
# run_structured_scale.sh run checkpoints step 10000 with exactly those
# knobs — pass SKIP_DEFAULT=1 and read its ceiling from the parity job.
#
# Phase B (manual, from the screen's contenders): build_index + parity for
# the default and the best non-default config — the parity-vs-oracle table
# at 4.2M that picks the shipped default.
#
# Reference knobs: NANN_impls model.py:134-147 (fgsm eps/weight),
# config.py:30-33.
#
# Usage: bash scripts/fgsm_sweep.sh [steps] [test_users]
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS=${1:-10000}
USERS=${2:-1024}
DATA=runs/ub_structured/data
ROOT=runs/fgsm

for CFG in "1e-3 1" "1e-2 1" "3e-5 2" "1e-3 2" "1e-2 2"; do
  set -- $CFG
  EPS=$1; W=$2
  OUT="$ROOT/e${EPS}_w${W}"
  mkdir -p "$OUT"
  if [ ! -f "$OUT/ORACLE_DONE" ]; then
    echo "=== FGSM eps=$EPS w=$W train($STEPS) $(date -u +%H:%M:%S)"
    python -m nann_tpu.main --job-type train --dataset-dir "$DATA" \
      --output-root "$OUT" --max-steps "$STEPS" --save-freq "$STEPS" \
      --print-freq 2000 --adv-eps "$EPS" --adv-weight "$W"
    echo "=== extract $(date -u +%H:%M:%S)"
    python -m nann_tpu.main --job-type extract_feature --dataset-dir "$DATA" \
      --output-root "$OUT" --adv-eps "$EPS" --adv-weight "$W"
    echo "=== oracle (test_all, $USERS users) $(date -u +%H:%M:%S)"
    python -m nann_tpu.main --job-type test_all --dataset-dir "$DATA" \
      --output-root "$OUT" --num-test-batch "$USERS" \
      --adv-eps "$EPS" --adv-weight "$W" 2>&1 | tee "$OUT/oracle.log" \
      | grep -E "Test-all|Recall"
    touch "$OUT/ORACLE_DONE"
  fi
done
echo "FGSM_SCREEN_DONE $(date -u +%H:%M:%S)"
