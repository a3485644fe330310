#!/usr/bin/env bash
# Round-4 measurement batch, part B — runs after the structured-scale
# pipeline completed (STRUCTURED_SCALE_DONE 02:04, parity 85.6%). Stages are
# independently valuable; none aborts the batch.
set -u
cd "$(dirname "$0")/.."
ROOT=runs/ub_structured
DATA=$ROOT/data
OUT=$ROOT/out

stage() { echo "=== $1 $(date -u +%H:%M:%S)"; }

stage "ladder (200k/1M/4.2M/8M, device-true; 4.2M+ at cap 8192)"
python scripts/ladder_bench.py \
  --points 200000 1000000 4200000 8000000 \
  --out runs/ladder_r4.json
echo "rc=$?"

stage "engine_curve 4.2M int8"
python scripts/engine_curve.py --items 4200000 --dtype int8 \
  --out runs/engine_curve_4p2m.json
echo "rc=$?"

stage "bench re-warm (driver artifact preview)"
python bench.py
echo "rc=$?"

stage "per-hop frontier-cap A/B at 4.2M (device-true throughput)"
NANN_BENCH_FCAP_HOPS=4096,8192,8192,8192 python scripts/ladder_bench.py \
  --points 4200000 --dtypes int8 --out runs/ladder_r4_perhop.json
echo "rc=$?"

stage "per-hop frontier-cap A/B at 4.2M (recall, 1024 users)"
python -m nann_tpu.main --job-type test --dataset-dir "$DATA" \
  --output-root "$OUT" --num-test-batch 1024 2>&1 | tail -4
echo "rc=$? (scalar 8192)"
python -m nann_tpu.main --job-type test --dataset-dir "$DATA" \
  --output-root "$OUT" --num-test-batch 1024 \
  --frontier-cap-per-hop 4096 8192 8192 8192 2>&1 | tail -4
echo "rc=$? (per-hop 4096,8192,8192,8192)"

stage "profiler attempt (SURVEY 5.1; relay-blocked in r2+r3)"
timeout 600 python bench.py --quick --items 20000 \
  --profile /tmp/nann_trace_r4
echo "PROFILER_ATTEMPT rc=$?"
ls /tmp/nann_trace_r4 2>/dev/null || echo "no trace produced"

echo "TPU_BATCH_R4B_DONE $(date -u +%H:%M:%S)"
