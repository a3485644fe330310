"""Per-op HBM byte attribution of the search program (VERDICT r2 item 4).

The program-level census (bench.py --cost) pinned the batched search at
~139 MB/query, ~50x the frontier rows it logically needs, with no visibility
into WHICH instruction carries the bytes. This script decomposes it two ways:

  1. per-instruction: utils.trace.per_op_bytes walks the post-fusion HLO and
     charges each ENTRY op result+operand bytes (gather-style whole-operand
     over-counts are tagged), printing the top movers.
  2. differencing: program-level cost_analysis deltas across the storage
     dtype (bf16 vs int8 index) and ablation variants (_score/_filter off),
     attributing bytes to the scorer / filter / walk stages with XLA's own
     cost model (no re-implementation drift).

Usage: python scripts/hbm_attrib.py [--items 200000] [--batch 16] [--top 12]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def batched(mcfg, scfg, **kw):
    from nann_tpu.search import make_searcher
    return jax.jit(jax.vmap(make_searcher(mcfg, scfg, **kw),
                            in_axes=(None, None, None, 0, None)))


def program_bytes(fn, *args):
    from nann_tpu.utils.trace import compiled_cost
    ca = compiled_cost(fn, *args)
    return ca.get("bytes_accessed", float("nan")), ca


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=200_000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    from bench import build_setup
    from nann_tpu.search import SearchIndex
    from nann_tpu.search.beam import level_topn_default
    from nann_tpu.utils.trace import per_op_bytes

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    mcfg, scfg, params, state, sidx = build_setup(args.items)
    rng = np.random.default_rng(1)
    userB = jnp.asarray(rng.standard_normal(
        (args.batch, mcfg.max_seq_length, mcfg.user_emb_dim)
    ).astype(np.float32))
    ltn = jnp.asarray(level_topn_default(scfg))

    fn = batched(mcfg, scfg)
    total, ca = program_bytes(fn, params, state, sidx, userB, ltn)
    print(f"\n== program census (bf16 index, batch {args.batch}): "
          f"{total/1e6:.1f} MB/batch = {total/1e6/args.batch:.1f} MB/query, "
          f"entry_ops={ca.get('entry_ops')} fusions={ca.get('fusions')}")

    print(f"\n== top-{args.top} instructions by charged bytes "
          f"(gatherish = whole-operand over-count, see utils/trace.py)")
    rep = per_op_bytes(fn, params, state, sidx, userB, ltn, top=args.top)
    for cname, rows in rep.items():
        print(f"-- {cname}")
        for r in rows:
            tag = " GATHERISH" if r["gatherish"] else ""
            print(f"  {r['total_mb']:10.2f} MB  {r['opcode']:<18s} "
                  f"res={r['result_mb']:.2f} ops={r['operand_mb']:.2f} "
                  f"{r['op'][:60]}{tag}")

    # ---- differencing: XLA's own program-level bytes across variants
    print("\n== stage differencing (program-level cost_analysis)")
    rows = []
    variants = [
        ("full bf16", {}, None),
        ("no_score", {"_score": False}, None),
        ("no_filter", {"_filter": False}, None),
        ("walk only", {"_score": False, "_filter": False}, None),
        ("full int8", {}, "int8"),
    ]
    for name, kw, dtype in variants:
        s = sidx
        if dtype == "int8":
            _m, _s, _p, _st, s = build_setup(args.items, dtype="int8")
        f = batched(mcfg, scfg, **kw)
        b, c = program_bytes(f, params, state, s, userB, ltn)
        rows.append((name, b))
        print(f"  {name:<12s} {b/1e6:9.1f} MB/batch  "
              f"({b/1e6/args.batch:6.2f} MB/query)  "
              f"entry_ops={c.get('entry_ops')}", flush=True)
    base = dict(rows)["full bf16"]
    for name, b in rows[1:]:
        print(f"  Δ(full bf16 - {name}) = {(base-b)/1e6:8.1f} MB/batch")


if __name__ == "__main__":
    main()
