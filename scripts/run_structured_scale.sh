#!/usr/bin/env bash
# Structured-corpus run at reference scale: the at-scale recall/parity proof.
#
# The plain synthetic UserBehavior stream (global Zipf, no per-user structure)
# makes next-item prediction information-theoretically ~0% at 4.2M items, so
# round 2's first at-scale pipeline run could only prove mechanics/throughput.
# gen_ub_csv.py --structured gives each user 1-3 hash-derived preferred
# categories with Zipf-within-category items, so recall at 4.2M items is
# learnable and the reference's north-star metric (recall parity vs the
# brute-force oracle, NANN_impls/main.py:144-237) is meaningful at scale.
#
# Stages (gen + convert are expected to have run already; see below):
#   train (packed 87M-sample corpus, TPU) -> extract 4.2M embeddings ->
#   native HNSW build -> parity (graph recall / oracle recall)
#
# Usage: bash scripts/run_structured_scale.sh [max_steps] [ef_construction]
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS=${1:-30000}
EF=${2:-100}
ROOT=runs/ub_structured
DATA="$ROOT/data"
OUT="$ROOT/out"
mkdir -p "$OUT"

if [ ! -f "$DATA/ub_meta.json" ]; then
  echo "corpus missing — generating (gen_ub_csv --structured + packed convert)"
  python scripts/gen_ub_csv.py --rows 100000000 --structured \
    --out "$ROOT/UserBehavior.csv"
  python - <<PY
from nann_tpu.data.user_behavior import convert_user_behavior
convert_user_behavior("$ROOT/UserBehavior.csv", "$DATA", packed=True)
PY
fi

COMMON=(--dataset-dir "$DATA" --output-root "$OUT")

echo "=== train (max_steps=$STEPS) $(date -u +%H:%M:%S)"
# warmup+cosine, not the reference's constant 3e-3: at constant lr the
# oracle ceiling degrades monotonically past 10k steps at 4.2M (66.0% ->
# 54.3% over 50k), and at 100k the unwarmed hot start caps the ceiling at
# 17% vs cosine's 72.5% (docs/DESIGN.md round 4, scripts/lr_schedule_ab.sh)
python -m nann_tpu.main --job-type train "${COMMON[@]}" \
  --max-steps "$STEPS" --save-freq 10000 --print-freq 200 \
  --lr-schedule cosine --warmup-steps 500

echo "=== select_checkpoint (deploy-by-oracle) $(date -u +%H:%M:%S)"
# the reference deploys the checkpoint test_all likes best (main.py:194-237);
# exporting the newest one shipped a degraded model at 4.2M in round 3
# (57.4% vs 67.3% oracle). Screening runs bf16 on a 512-user slice (~4x
# faster oracle; selection is a RELATIVE comparison, so consistent-across-
# checkpoints numerics is all it needs); the parity stage re-measures the
# winner fp32 on the full 4096 users.
python -m nann_tpu.main --job-type select_checkpoint "${COMMON[@]}" \
  --num-test-batch 512 --bf16

echo "=== extract_feature $(date -u +%H:%M:%S)"
python -m nann_tpu.main --job-type extract_feature "${COMMON[@]}"

echo "=== build_index (ef=$EF) $(date -u +%H:%M:%S)"
python -m nann_tpu.main --job-type build_index "${COMMON[@]}" \
  --ef-construction "$EF"

echo "=== parity $(date -u +%H:%M:%S)"
# frontier_cap defaults catalogue-aware now (8192 at 4.2M — the round-3 gap
# analysis setting; config.default_frontier_cap)
python -m nann_tpu.main --job-type parity "${COMMON[@]}" \
  --num-test-batch 4096

echo "=== export + verify $(date -u +%H:%M:%S)"
python -m nann_tpu.main --job-type export "${COMMON[@]}"
python -m nann_tpu.main --job-type verify_export "${COMMON[@]}"

echo "STRUCTURED_SCALE_DONE $(date -u +%H:%M:%S)"
