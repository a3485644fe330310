#!/bin/bash
# Recall-parity sweep at 100k items on the p100k_v7 checkpoint (VERDICT #2b):
# graph-quality (ef_construction), enter budget, and frontier knobs.
# Ordered so program shapes recompile as rarely as possible:
#   pass 1 (one compile): baseline ef200, then ef400 / ef600 (same shapes)
#   pass 2: budget variants (shape changes -> one compile each)
# Usage: bash scripts/parity_sweep.sh [OUT=runs/p100k_v7]
set -e
cd /root/repo
OUT=${1:-runs/p100k_v7}
COMMON="--synthetic --num-item 100000 --num-cate 200 --num-users 300000 \
  --max-seq-length 50 --num-test-batch 512 --search-batch 64 --output-root $OUT"

run_parity () { # $1=tag  $2...=extra args
  echo "=== PARITY[$1] $* ==="
  timeout 3600 python -m nann_tpu.main --job-type parity $COMMON "${@:2}" \
    2>&1 | grep -E "PARITY|Recall|num_scoring" || true
}

# pass 1: graph-quality ladder on identical program shapes
run_parity ef200_base
for EF in 400 600; do
  IDX=$OUT/index_ef$EF
  if [ ! -f $IDX/enter_points.npy ]; then
    timeout 2400 python -m nann_tpu.main --job-type build_index $COMMON \
      --ef-construction $EF --index-dir $IDX
  fi
  run_parity ef$EF --index-dir $IDX
done

# pass 2: search-budget variants (each recompiles once)
run_parity budget_wide  --top-k-per-level 600 300 150
run_parity budget_hops  --num-scoring-per-level 4 1 1
run_parity enter_budget --top-k-per-level 400 200 200

echo SWEEP_DONE
