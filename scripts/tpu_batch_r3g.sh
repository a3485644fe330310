#!/usr/bin/env bash
# Final round-3 TPU sequence: 4.2M ladder point + full bench warm.
set -u
cd "$(dirname "$0")/.."
while ! grep -q "FGSM_SCREEN_PARTIAL_DONE" runs/tpu_batch_r3f.log 2>/dev/null; do sleep 60; done
echo "=== ladder 4.2M (device-true) $(date -u +%H:%M:%S)"
timeout 4800 python scripts/ladder_bench.py --points 4200000 --chain 30 \
  --out runs/ladder_4p2m.json 2>&1 | grep -v WARNING
echo "=== full bench warm (driver prep) $(date -u +%H:%M:%S)"
timeout 3600 python bench.py --chained 128 --cost 2>/dev/null | tee runs/bench_r3_final.json
echo "TPU_BATCH_G_DONE $(date -u +%H:%M:%S)"
