#!/usr/bin/env bash
# Waits for the structured pipeline's own (CPU-heavy) build_index stage to
# finish, then builds the remaining bench-cache indexes at full threads.
set -u
cd "$(dirname "$0")/.."
LOG=runs/ub_structured/pipeline.log
while ! grep -q "=== parity\|STRUCTURED_SCALE_DONE" "$LOG" 2>/dev/null; do
  sleep 60
done
echo "pipeline build done ($(date -u +%H:%M:%S)) — starting 4.2M/8M prebuilds"
python scripts/prebuild_bench_index.py --items 4200000 --threads 4 && \
python scripts/prebuild_bench_index.py --items 8000000 --threads 4
echo "PREBUILDS_DONE $(date -u +%H:%M:%S)"
