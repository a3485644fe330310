#!/usr/bin/env bash
# Round-4 TPU batch (serialized on the one relay chip), run AFTER the 90k-step
# training continuation finishes:
#
#   1. select_checkpoint over every retained checkpoint (the oracle-vs-steps
#      curve + deploy-by-oracle winner; VERDICT r3 items 1-2)
#   2. extract + rebuild the 4.2M index from the winner
#   3. parity at 4096 users (catalogue-aware cap 8192)
#   4. export (signature now carries cap 8192 + the selected step) + verify
#   5. scale ladder incl. the never-measured 8M device-true point (item 6)
#   6. engine curve at 4.2M int8 (item 8)
#   7. bench.py re-warm (new compile keys: cap 8192 at 4.2M, calibration)
#   8. profiler attempt (item 10; expected environment-blocked — logged)
#
# Stages don't abort the batch on failure (each is independently valuable);
# the log carries per-stage rc.
set -u
cd "$(dirname "$0")/.."
ROOT=runs/ub_structured
DATA=$ROOT/data
OUT=$ROOT/out

stage() { echo "=== $1 $(date -u +%H:%M:%S)"; }

# Stages 1-4 = one CLEAN run_structured_scale.sh invocation (VERDICT r3
# weak #4: the pipeline has never completed in one go): train is a no-op
# resume at the met budget, then select_checkpoint (every retained
# checkpoint incl. the step_1 untrained baseline — the oracle-vs-steps
# curve), extract, index rebuild from the winner, parity at 4096 users,
# export, verify. pipeline.log rotates; the fresh one must have no
# Traceback.
stage "structured-scale pipeline (select -> parity -> export)"
[ -f "$ROOT/pipeline.log" ] && mv "$ROOT/pipeline.log" "$ROOT/pipeline_r3.log"
bash scripts/run_structured_scale.sh 90000 100 \
  > "$ROOT/pipeline.log" 2>&1
echo "rc=$? (see $ROOT/pipeline.log)"
grep -E "SELECTED|PARITY|STRUCTURED_SCALE_DONE|Traceback" "$ROOT/pipeline.log"

stage "ladder (200k/1M/4.2M/8M, device-true)"
python scripts/ladder_bench.py \
  --points 200000 1000000 4200000 8000000 \
  --out runs/ladder_r4.json
echo "rc=$?"

stage "engine_curve 4.2M int8"
python scripts/engine_curve.py --items 4200000 --dtype int8 \
  --out runs/engine_curve_4p2m.json
echo "rc=$?"

stage "bench re-warm"
python bench.py
echo "rc=$?"

stage "per-hop frontier-cap A/B at 4.2M (device-true throughput)"
# measured hop profile at 4.2M: L1 ~2.8k mean / 3.1k max — cap it at 4096
# while ground hops keep 8192 (runs/tpu_batch_r3d.log); vs the scalar-8192
# int8 row in runs/ladder_r4.json
NANN_BENCH_FCAP_HOPS=4096,8192,8192,8192 python scripts/ladder_bench.py \
  --points 4200000 --dtypes int8 --out runs/ladder_r4_perhop.json
echo "rc=$?"

stage "per-hop frontier-cap A/B at 4.2M (recall, 1024 users)"
python -m nann_tpu.main --job-type test --dataset-dir "$DATA" \
  --output-root "$OUT" --num-test-batch 1024 2>&1 | tail -3
echo "rc=$? (scalar 8192)"
python -m nann_tpu.main --job-type test --dataset-dir "$DATA" \
  --output-root "$OUT" --num-test-batch 1024 \
  --frontier-cap-per-hop 4096 8192 8192 8192 2>&1 | tail -3
echo "rc=$? (per-hop 4096,8192,8192,8192)"

stage "profiler attempt (SURVEY 5.1; relay-blocked in r2+r3)"
timeout 600 python bench.py --quick --items 20000 \
  --profile /tmp/nann_trace_r4
echo "PROFILER_ATTEMPT rc=$?"
ls /tmp/nann_trace_r4 2>/dev/null || echo "no trace produced"

echo "TPU_BATCH_R4_DONE $(date -u +%H:%M:%S)"
