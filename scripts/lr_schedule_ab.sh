#!/usr/bin/env bash
# LR-schedule A/B (round 4): constant 3e-3 vs cosine(+warmup) at 100k items,
# same 15k-step budget, oracle-screened checkpoint curve every 2.5k steps.
#
# Motivation (measured, docs/DESIGN.md round 4): at 4.2M items the oracle
# ceiling DEGRADES monotonically past step 10001 at the reference's constant
# lr 3e-3 (66.0% @10k -> 54.3% @50k). The reference's 5-epoch constant-lr
# schedule never sees this regime; lr_schedule="cosine" is the proposed fix.
# This probe measures whether the schedule lifts/holds the ceiling at a
# scale where the full curve is affordable on one chip.
#
# Usage: bash scripts/babysit.sh 900 /tmp/lr_ab.log \
#          timeout 14000 bash scripts/lr_schedule_ab.sh
set -uo pipefail
cd "$(dirname "$0")/.."
DATA_NPZ=runs/p100k_v7/synth_100000_200_300000_50.npz
COMMON="--synthetic --num-item 100000 --num-cate 200 --num-users 300000 \
  --max-seq-length 50 --train-epochs 100 --max-steps 15000 \
  --save-freq 2500 --print-freq 250"

run_arm () { # $1=tag  $2...=extra train args
  OUT=runs/lr_ab/$1
  mkdir -p "$OUT"
  # reuse the tracked synthetic corpus (load_dataset cache contract)
  [ -f "$OUT/$(basename $DATA_NPZ)" ] || cp "$DATA_NPZ" "$OUT/"
  echo "=== ARM[$1] train $(date -u +%H:%M:%S)"
  python -m nann_tpu.main --job-type train $COMMON \
    --output-root "$OUT" "${@:2}"
  echo "rc=$?"
  echo "=== ARM[$1] oracle screen $(date -u +%H:%M:%S)"
  python -m nann_tpu.main --job-type select_checkpoint $COMMON \
    --output-root "$OUT" --num-test-batch 512 --bf16 "${@:2}"
  echo "rc=$?"
  echo "=== ARM[$1] curve:"
  cat "$OUT"/model/select_cache*.json 2>/dev/null || true
  echo
}

run_arm constant
run_arm cosine --lr-schedule cosine --warmup-steps 500
echo "LR_AB_DONE $(date -u +%H:%M:%S)"
