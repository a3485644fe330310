"""Decompose the fused-search cost with real program ablations.

Measures the actual search program with pieces swapped out:

  full           the production search (current defaults)
  serving        exported-graph semantics variant
  no_filter      visited filter + dedup + compaction replaced by raw
                 truncation (isolates the filter cost)
  no_score       scorer replaced by a row-sum (isolates the DNN cost)
  approx         topk_impl="approx" (TPU approx_max_k compaction)
  wide           hop_mode="wide" (sort-free hops)
  wide_approx    both

Batch-N pipelined timing (launch reps back-to-back, block once): per-dispatch
relay overhead (~0.7 ms) is <5% of a batch-16 call and identical across
variants. Use --chain for device-true single-query numbers (slow compile).

Usage: python scripts/ablate_bench.py [--items 200000] [--batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=200_000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--chain", type=int, default=0,
                    help="also device-true single-query via chained program")
    ap.add_argument("--variants", nargs="+",
                    default=["full", "no_filter", "no_score", "approx",
                             "wide", "wide_approx"])
    args = ap.parse_args()

    import dataclasses

    from bench import build_setup
    from nann_tpu.search import make_searcher
    from nann_tpu.search.beam import level_topn_default

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    mcfg, scfg, params, state, sidx = build_setup(args.items)
    rng = np.random.default_rng(1)
    user1 = jnp.asarray(rng.standard_normal(
        (mcfg.max_seq_length, mcfg.user_emb_dim)).astype(np.float32))
    userB = jnp.asarray(rng.standard_normal(
        (args.batch, mcfg.max_seq_length, mcfg.user_emb_dim)
    ).astype(np.float32))

    def variant(name):
        cfg, kw, mc = scfg, {}, mcfg
        if name == "staged":
            from nann_tpu.search.staged import make_staged_searcher
            return make_staged_searcher(mcfg, scfg), "staged"
        if name == "serving":
            kw["semantics"] = "serving"
        elif name == "no_filter":
            kw["_filter"] = False
        elif name == "no_score":
            kw["_score"] = False
        elif name == "pallas":
            kw["use_pallas_scorer"] = True
        elif name == "approx":
            cfg = dataclasses.replace(scfg, topk_impl="approx")
        elif name == "topk":
            cfg = dataclasses.replace(scfg, topk_impl="topk")
        elif name == "wide":
            cfg = dataclasses.replace(scfg, hop_mode="wide")
        elif name == "wide_approx":
            cfg = dataclasses.replace(scfg, hop_mode="wide",
                                      topk_impl="approx")
        elif name == "barrier":
            kw["_barrier"] = True
        elif name == "bf16":
            mc = dataclasses.replace(mcfg, compute_dtype="bfloat16")
        elif name == "barrier_bf16":
            kw["_barrier"] = True
            mc = dataclasses.replace(mcfg, compute_dtype="bfloat16")
        elif name == "pallas_bf16":
            kw["use_pallas_scorer"] = True
            mc = dataclasses.replace(mcfg, compute_dtype="bfloat16")
        elif name == "pallas_barrier":
            kw["use_pallas_scorer"] = True
            kw["_barrier"] = True
        return make_searcher(mc, cfg, **kw), kw.get("semantics")

    for name in args.variants:
        searcher, sem = variant(name)
        if sem == "staged":   # already batched, multi-program — no outer jit
            ltn = jnp.asarray(level_topn_default(scfg))
            fB = searcher
        else:
            ltn = jnp.asarray(level_topn_default(scfg, sem))
            fB = jax.jit(jax.vmap(searcher,
                                  in_axes=(None, None, None, 0, None)))
        t0 = time.time()
        out = fB(params, state, sidx, userB, ltn)
        jax.block_until_ready(out)
        comp = time.time() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fB(params, state, sidx, userB, ltn)
        jax.block_until_ready(out)
        per_q = (time.perf_counter() - t0) / args.reps / args.batch * 1e3
        line = (f"{name:12s} batch{args.batch} {per_q:7.3f} ms/q "
                f"({args.batch/per_q*1e3/args.batch:6.1f} q/ms... "
                f"{1e3/per_q:7.1f} qps)  num_scoring="
                f"{int(np.asarray(out[2]).sum()/args.batch)}  "
                f"[compile {comp:.0f}s]")
        print(line, flush=True)

        if args.chain:
            N = args.chain

            @jax.jit
            def chained(params, state, sidx, user, ltn, searcher=searcher):
                def body(_i, carry):
                    u = user + carry * 1e-12
                    _it, scores, _ns = searcher(params, state, sidx, u, ltn)
                    return scores[0]
                return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))
            t0 = time.time()
            jax.block_until_ready(chained(params, state, sidx, user1, ltn))
            comp = time.time() - t0
            t0 = time.perf_counter()
            outs = [chained(params, state, sidx, user1, ltn)
                    for _ in range(3)]
            jax.block_until_ready(outs)
            ms1 = (time.perf_counter() - t0) / (N * 3) * 1e3
            print(f"{name:12s} single (device-true) {ms1:7.3f} ms/q  "
                  f"[compile {comp:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
