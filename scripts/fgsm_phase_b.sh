#!/usr/bin/env bash
# FGSM Phase B (VERDICT r3 item 7): the parity-vs-oracle table that picks the
# shipped adversarial-training default with data.
#
# Reference knobs: adv_eps/adv_weight (NANN_impls/nann/config.py:30-33,
# model.py:134-147; defaults eps=3e-5, weight=1). Round-1 found the eps
# regime matters (1e-3 beat 3e-5 at 40k samples); round-3's Phase A screened
# only one point at 4.2M before the round ended. This runs the full small
# grid at 100k items under the measured-best schedule (warmup+cosine,
# scripts/lr_schedule_ab.sh), 5k steps each, deploy-by-oracle selection,
# then the FULL parity pipeline (extract -> HNSW build -> graph vs oracle)
# per arm — parity, not just the oracle ceiling, is what FGSM exists to move
# (smoother score landscape -> graph search recovers more of the top-k).
#
# Every stage is idempotent (skipped when its artifact exists) so a
# babysit.sh restart after a relay drop resumes at the unfinished stage.
#
# Usage: bash scripts/babysit.sh 900 /tmp/fgsm_b.log \
#          timeout 13000 bash scripts/fgsm_phase_b.sh
set -uo pipefail
cd "$(dirname "$0")/.."
DATA_NPZ=runs/p100k_v7/synth_100000_200_300000_50.npz
COMMON="--synthetic --num-item 100000 --num-cate 200 --num-users 300000 \
  --max-seq-length 50 --train-epochs 100 --max-steps 5000 \
  --save-freq 2500 --print-freq 500 \
  --lr-schedule cosine --warmup-steps 500"

run_arm () { # $1=tag  $2=eps  $3=weight
  OUT=runs/fgsm_b/$1
  if [ -f "$OUT/parity.json" ]; then
    echo "=== FGSM[$1] already done: $(cat "$OUT/parity.json")"
    return
  fi
  mkdir -p "$OUT"
  [ -f "$OUT/$(basename $DATA_NPZ)" ] || cp "$DATA_NPZ" "$OUT/"
  ARGS="$COMMON --output-root $OUT --adv-eps $2 --adv-weight $3"
  echo "=== FGSM[$1] eps=$2 w=$3 train $(date -u +%H:%M:%S)"
  python -m nann_tpu.main --job-type train $ARGS
  echo "rc=$?"
  if [ ! -f "$OUT/model/selected_step.json" ]; then
    echo "=== FGSM[$1] select $(date -u +%H:%M:%S)"
    python -m nann_tpu.main --job-type select_checkpoint $ARGS \
      --num-test-batch 512 --bf16 2>&1 | grep -E "SELECTED|checkpoint step"
  fi
  echo "=== FGSM[$1] extract+index+parity $(date -u +%H:%M:%S)"
  [ -f "$OUT/embeddings/item_embs.npy" ] || \
    python -m nann_tpu.main --job-type extract_feature $ARGS > /dev/null 2>&1
  [ -f "$OUT/index/enter_points.npy" ] || \
    python -m nann_tpu.main --job-type build_index $ARGS 2>&1 | tail -1
  python -m nann_tpu.main --job-type parity $ARGS --num-test-batch 512 \
    2>&1 | grep -E "PARITY|Recall|num_scoring" | tee "$OUT/parity.log"
  grep -q "PARITY" "$OUT/parity.log" && \
    grep "PARITY" "$OUT/parity.log" > "$OUT/parity.json"
  echo "=== FGSM[$1] done $(date -u +%H:%M:%S)"
}

run_arm e3e-5_w1 3e-5 1.0      # the reference default
run_arm e0_w0    0.0  0.0      # no-FGSM control
run_arm e1e-3_w1 1e-3 1.0      # round-1's winner at small data
run_arm e1e-2_w1 1e-2 1.0      # strong-eps regime
run_arm e1e-3_w2 1e-3 2.0      # weight axis
echo "FGSM_PHASE_B_DONE $(date -u +%H:%M:%S)"
