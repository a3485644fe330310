#!/usr/bin/env bash
# Round-3 "after the layout fix" TPU batch. Waits for the structured
# pipeline to release the TPU, then measures.
set -u
cd "$(dirname "$0")/.."
while ! grep -q "STRUCTURED_SCALE_DONE\|Traceback" runs/ub_structured/pipeline.log 2>/dev/null; do
  sleep 60
done
echo "pipeline done ($(date -u +%H:%M:%S)) — starting AFTER measurements"
echo "=== HLO copy check (expect 0 whole-table copies) $(date -u +%H:%M:%S)"
timeout 1800 python - <<'PY'
import os, sys, re
sys.path.insert(0, ".")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
import jax, jax.numpy as jnp, numpy as np
from bench import build_setup
from nann_tpu.search import make_searcher
from nann_tpu.search.beam import level_topn_default
mcfg, scfg, params, state, sidx = build_setup(200_000)
print("neighbors0 layout:", sidx.neighbors[0].format.layout)
rng = np.random.default_rng(1)
userB = jnp.asarray(rng.standard_normal((16, mcfg.max_seq_length, mcfg.user_emb_dim)).astype(np.float32))
ltn = jnp.asarray(level_topn_default(scfg))
fn = jax.jit(jax.vmap(make_searcher(mcfg, scfg), in_axes=(None,None,None,0,None)))
comp = fn.lower(params, state, sidx, userB, ltn).compile()
txt = comp.as_text()
slices = len(re.findall(r"slice-start", txt))
copies = [m for m in re.findall(r"%copy\.\d+ = \S+", txt) if "200000" in m]
ca = comp.cost_analysis(); ca = ca[0] if isinstance(ca, list) else ca
print("slice-start count:", slices//2, "whole-table copies:", len(copies))
for c in copies[:6]: print("  ", c[:90])
print("bytes_accessed MB/batch:", round(ca.get("bytes accessed", 0)/1e6, 1))
open("runs/search_b16_after.hlo.txt", "w").write(txt)
PY
echo "=== bench AFTER $(date -u +%H:%M:%S)"
timeout 2400 python bench.py --chained 64 --sweep --cost 2>bench_r3b_stderr.log | tee runs/bench_r3_after.json
echo "=== ladder AFTER 200k/1M $(date -u +%H:%M:%S)"
timeout 3600 python scripts/ladder_bench.py --points 200000 1000000 --chain 30 --out runs/ladder_after.json 2>&1 | grep -v WARNING
echo "=== engine curve (clean window) $(date -u +%H:%M:%S)"
timeout 2400 python scripts/engine_curve.py 2>&1 | grep -v WARNING | tail -8
echo "=== memory profile attempt $(date -u +%H:%M:%S)"
timeout 300 python - <<'PY'
import os, sys
sys.path.insert(0, ".")
import jax
try:
    prof = jax.profiler.device_memory_profile()
    open("runs/device_memory.pprof", "wb").write(prof)
    print("device_memory_profile ok:", len(prof), "bytes -> runs/device_memory.pprof")
except Exception as e:
    print("device_memory_profile failed:", type(e).__name__, str(e)[:200])
PY
echo "TPU_BATCH_B_DONE $(date -u +%H:%M:%S)"
