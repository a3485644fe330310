#!/usr/bin/env bash
# UserBehavior end-to-end driver — parity with the reference's run.sh flow
# (convert -> train -> extract -> index -> eval -> export -> serve-bench).
# Requires UserBehavior.csv (https://tianchi.aliyun.com/dataset/649).
set -euo pipefail

CSV=${1:?usage: run_ub.sh UserBehavior.csv [output_root]}
OUT=${2:-output/ub}
DATA="$OUT/data"

python - <<PY
from nann_tpu.data.user_behavior import convert_user_behavior
convert_user_behavior("$CSV", "$DATA")
PY

COMMON=(--dataset-dir "$DATA" --output-root "$OUT")
python -m nann_tpu.main --job-type train           "${COMMON[@]}"
python -m nann_tpu.main --job-type extract_feature "${COMMON[@]}"
python -m nann_tpu.main --job-type build_index     "${COMMON[@]}"
python -m nann_tpu.main --job-type parity          "${COMMON[@]}"
python -m nann_tpu.main --job-type export          "${COMMON[@]}"
python -m nann_tpu.main --job-type verify_export   "${COMMON[@]}"
python -m nann_tpu.main --job-type serve_bench     "${COMMON[@]}"
