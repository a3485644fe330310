#!/usr/bin/env bash
# Round-3 TPU measurement batch (runs while the 4.2M build holds the CPU).
set -u
cd "$(dirname "$0")/.."
echo "=== bench (headline, post-layout-fix) $(date -u +%H:%M:%S)"
timeout 2400 python bench.py --chained 64 --sweep --cost 2>bench_r3_stderr.log | tee runs/bench_r3_headline.json
echo "=== HLO copy check $(date -u +%H:%M:%S)"
timeout 1200 python - <<'PY'
import os, sys
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
import re
slices = len(re.findall(r"slice-start", txt))
copies = [m for m in re.findall(r"%copy\.\d+ = \S+", txt) if "200000" in m]
ca = comp.cost_analysis()
ca = ca[0] if isinstance(ca, list) else ca
print("slice-start count:", slices//2, "whole-table copies:", len(copies))
for c in copies[:6]: print("  ", c[:90])
print("bytes_accessed MB/batch:", round(ca.get("bytes accessed", 0)/1e6, 1))
PY
echo "=== ladder 200k/1M $(date -u +%H:%M:%S)"
timeout 3600 python scripts/ladder_bench.py --points 200000 1000000 --chain 30 2>&1 | grep -v WARNING
echo "=== scorer probe (pallas verdict) $(date -u +%H:%M:%S)"
timeout 2400 python scripts/scorer_probe.py --rows 65536 --chain 20 2>&1 | grep -v WARNING | tail -30
echo "=== engine curve $(date -u +%H:%M:%S)"
timeout 2400 python scripts/engine_curve.py 2>&1 | grep -v WARNING | tail -12
echo "=== profiler attempt $(date -u +%H:%M:%S)"
timeout 420 python bench.py --quick --profile /tmp/prof_r3 2>&1 | tail -3
echo "profiler exit: $?"
echo "TPU_BATCH_DONE $(date -u +%H:%M:%S)"
