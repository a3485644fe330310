#!/usr/bin/env bash
# LR-decay probe (round 4): the oracle-vs-steps curve measured the ceiling
# DEGRADING monotonically past step 10001 at constant lr 3e-3
# (66.0% @10k -> 64.3% @20k -> 58.8% @30k -> 56.1% @40k -> 54.3% @50k,
# bf16/512 users — model/select_cache_*.json). Classic too-hot-late-training:
# the reference trains 5 epochs at constant lr on a corpus ~6x smaller per
# step count, so its schedule never sees this regime. Probe: resume from the
# step-10001 winner with lr cut 10x, +10k steps, and oracle-screen the
# result against the 66.0% baseline.
#
# Usage: bash scripts/babysit.sh 900 runs/lr_decay_probe.log \
#          timeout 10000 bash scripts/lr_decay_probe.sh
set -uo pipefail
cd "$(dirname "$0")/.."
ROOT=runs/ub_structured
OUT=$ROOT/out_lrdecay
mkdir -p "$OUT/model"

# seed the run with ONLY the selected winner so auto-resume starts there
if [ ! -d "$OUT/model/step_10001" ]; then
  cp -r "$ROOT/out/model/step_10001" "$OUT/model/step_10001"
fi

echo "=== train +10k @ lr 3e-4 $(date -u +%H:%M:%S)"
python -m nann_tpu.main --job-type train --dataset-dir "$ROOT/data" \
  --output-root "$OUT" --max-steps 20001 --save-freq 5000 --print-freq 500 \
  --learning-rate 3e-4
echo "rc=$?"

echo "=== oracle screen (bf16, 512 users) $(date -u +%H:%M:%S)"
python -m nann_tpu.main --job-type select_checkpoint --dataset-dir "$ROOT/data" \
  --output-root "$OUT" --num-test-batch 512 --bf16
echo "rc=$?"
echo "LR_DECAY_PROBE_DONE (baseline: step_10001 @ 66.02%)"
