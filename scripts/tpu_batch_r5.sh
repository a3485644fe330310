#!/usr/bin/env bash
# Round-5 measurement batch — runs AFTER run_structured_scale.sh completed
# (STRUCTURED_SCALE_DONE in runs/r5_pipeline.log). Stages are idempotent and
# independently valuable; none aborts the batch. Wrap in babysit.sh.
set -u
cd "$(dirname "$0")/.."
ROOT=runs/ub_structured
DATA=$ROOT/data
OUT=$ROOT/out
MEAS=docs/measurements
mkdir -p "$MEAS"

stage() { echo "=== $1 $(date -u +%H:%M:%S)"; }

# ------------------------------------------------- re-export with tuned caps
stage "re-export with autotuned per-hop caps (+ provenance in signature)"
python -m nann_tpu.main --job-type export --dataset-dir "$DATA" \
  --output-root "$OUT" --autotune-caps --num-test-batch 256
echo "rc=$?"
python -m nann_tpu.main --job-type verify_export --dataset-dir "$DATA" \
  --output-root "$OUT" 2>&1 | tail -2
echo "rc=$? (verify re-export)"
CAPS=$(python - <<'PY'
import json
try:
    sig = json.load(open("runs/ub_structured/out/export/signature.json"))
    caps = sig["search_config"].get("frontier_cap_per_hop") or []
    print(" ".join(str(c) for c in caps))
except Exception:
    print("")
PY
)
echo "tuned caps: [$CAPS]"

# ------------------------------------------------------- per-hop cap A/B (#3)
stage "per-hop cap A/B at 4.2M: recall (1024 users)"
python -m nann_tpu.main --job-type test --dataset-dir "$DATA" \
  --output-root "$OUT" --num-test-batch 1024 2>&1 | tail -3
echo "rc=$? (scalar 8192)"
if [ -n "$CAPS" ]; then
  python -m nann_tpu.main --job-type test --dataset-dir "$DATA" \
    --output-root "$OUT" --num-test-batch 1024 \
    --frontier-cap-per-hop $CAPS 2>&1 | tail -3
  echo "rc=$? (per-hop $CAPS)"
fi

stage "per-hop cap A/B at 4.2M: device-true throughput (bench corpus, caps
autotuned on that corpus's own probe profile — apples to apples)"
python bench.py --items 4200000 --dtype int8 --batch 64 \
  > runs/bench_4p2m_scalar.json
echo "rc=$? (scalar)"
python bench.py --items 4200000 --dtype int8 --batch 64 --autotune-caps \
  > runs/bench_4p2m_perhop.json
echo "rc=$? (per-hop)"
cp runs/bench_4p2m_scalar.json runs/bench_4p2m_perhop.json "$MEAS/" \
  2>/dev/null || true

# ----------------------------------------------------------------- ladder (#6)
stage "ladder (200k/1M/4.2M/8M as built, device-true)"
python scripts/ladder_bench.py \
  --points 200000 1000000 4200000 8000000 --out runs/ladder_r5.json
echo "rc=$?"
cp runs/ladder_r5.json "$MEAS/ladder_r5.json" 2>/dev/null || true

# ------------------------------------------------------- bench (engine fix #1)
stage "bench re-warm (driver artifact preview; validates calibration fix)"
python bench.py
echo "rc=$?"

# ------------------------------------------------------------- profiler (#9)
stage "profiler attempt (SURVEY 5.1; relay-blocked rounds 2-4)"
timeout 600 python bench.py --quick --items 20000 --profile /tmp/nann_trace_r5
echo "PROFILER_ATTEMPT rc=$?"
ls /tmp/nann_trace_r5 2>/dev/null || echo "no trace produced"

# ---------------------------------------------------------------- FGSM phase C
# The one missing grid cell: eps 0 vs the reference default 3e-5 at 4.2M
# under the cosine schedule + selection (Phase B proved the wash at 100k;
# round-3 Phase A only compared 3e-5 vs 1e-3 at scale). Same corpus, same
# budget/schedule as the main pipeline run — only FGSM differs. Runs LAST:
# it holds the TPU ~1.5 h and every other stage's artifact matters more.
stage "fgsm_c: eps=0 arm at 4.2M (50k cosine)"
if [ ! -f runs/fgsm_c_e0/model/selected_step.json ]; then
  mkdir -p runs/fgsm_c_e0
  python -m nann_tpu.main --job-type train --dataset-dir "$DATA" \
    --output-root runs/fgsm_c_e0 --max-steps 50000 --save-freq 10000 \
    --print-freq 200 --lr-schedule cosine --warmup-steps 500 \
    --adv-eps 0 --adv-weight 0
  python -m nann_tpu.main --job-type select_checkpoint --dataset-dir "$DATA" \
    --output-root runs/fgsm_c_e0 --num-test-batch 512 --bf16 \
    --adv-eps 0 --adv-weight 0
fi
echo "rc=$?"
cp runs/fgsm_c_e0/model/selected_step.json "$MEAS/fgsm_c_e0_selection.json" \
  2>/dev/null || true
cp "$OUT/model/selected_step.json" "$MEAS/fgsm_c_e3e-5_selection.json" \
  2>/dev/null || true

# ------------------------------------------------------------------- collect
stage "collect parity artifacts"
cp "$OUT/parity_result.json" "$MEAS/parity_4p2m_r5.json" 2>/dev/null || true
# the batch log itself carries the recall-A/B lines — runs/ is gitignored,
# so snapshot it as committed evidence
cp runs/r5_batch.log "$MEAS/batch_r5_log.txt" 2>/dev/null || true
echo "TPU_BATCH_R5_DONE $(date -u +%H:%M:%S)"
